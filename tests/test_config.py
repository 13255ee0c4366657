"""Config parser + shipped presets (reference `config_parser.py:1-39`)."""
import glob
import os

import pytest

from checkerpose_tpu.config import get_train_stage, parse_cfg, stage_start_steps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(glob.glob(os.path.join(REPO, "config", "*", "*.txt")))


def test_grammar_and_coercions(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text(
        "#### comment\n"
        "\n"
        "type = GNN\n"                      # renamed to _type
        "seg_visib_loss_weight = 1\n"        # *_weight -> float
        "network_graph_leaky_slope = 0.2\n"  # whitelist -> float
        "total_iteration = 380000\n"         # numeric -> int
        "learning_rate2 = 0.00005\n"         # learning_rate* -> float
        "train_obj_visible_theshold = 0.2\n"  # sic (reference typo) -> float
        "padding_ratio = 1.5\n"
        "load_checkpoint=False\n"
        "use_peper_salt= True\n"
        "resize_method = crop_square_resize\n")
    cfg = parse_cfg(str(p))
    assert cfg["_type"] == "GNN" and "type" not in cfg
    assert cfg["seg_visib_loss_weight"] == 1.0 and isinstance(
        cfg["seg_visib_loss_weight"], float)
    assert isinstance(cfg["network_graph_leaky_slope"], float)
    assert cfg["total_iteration"] == 380000 and isinstance(
        cfg["total_iteration"], int)
    assert cfg["learning_rate2"] == pytest.approx(5e-5)
    assert cfg["train_obj_visible_theshold"] == pytest.approx(0.2)
    assert cfg["padding_ratio"] == pytest.approx(1.5)
    assert cfg["load_checkpoint"] is False
    assert cfg["use_peper_salt"] is True
    assert cfg["resize_method"] == "crop_square_resize"


@pytest.mark.parametrize("path", PRESETS, ids=[
    os.path.relpath(p, REPO) for p in PRESETS])
def test_all_shipped_presets_parse(path):
    cfg = parse_cfg(path)
    # every preset must carry a consistent typed core
    assert isinstance(cfg["total_iteration"], int)
    assert isinstance(cfg["batch_size"], int)
    assert isinstance(cfg["learning_rate"], float)
    assert isinstance(cfg["padding_ratio"], float)
    assert cfg["resize_method"] in (
        "crop_resize", "crop_resize_by_warp_affine", "crop_square_resize")
    assert isinstance(cfg["num_p3d_log2"], int)
    res_key = "network_res_log2"
    assert isinstance(cfg[res_key], int) and 3 <= cfg[res_key] <= 6
    if "stage_start_steps_str" in cfg:
        starts = stage_start_steps(cfg)
        assert len(starts) == cfg[res_key] - 3
        assert all(isinstance(s, int) for s in starts)


def test_stage_helpers():
    assert stage_start_steps({"stage_start_steps_str": "0_10_20"}) == (0, 10, 20)
    assert stage_start_steps({}) is None
    starts = (0, 10, 20)
    assert get_train_stage(0, starts) == 1
    assert get_train_stage(10, starts) == 2
    assert get_train_stage(19, starts) == 2
    assert get_train_stage(99999, starts) == 3


def test_resolve_cfg_lm_obj_names_string(tmp_path):
    """A cfg-file `obj_names = a,b` list selects the LM object subset (used
    by the synthetic multi-object proof configs under config/synth)."""
    from checkerpose_tpu.cli.common import resolve_cfg_lm
    p = tmp_path / "lm.txt"
    p.write_text(
        "dataset_name = synth\n"
        "obj_names = obj01, obj03\n"
        "bop_path = /tmp/nowhere\n")
    cfg = resolve_cfg_lm(str(p))
    assert cfg["obj_names"] == ["obj01", "obj03"]
    assert cfg["obj_ids"] == [1, 3]
    # default: no obj_names key -> the 13-object Linemod benchmark list
    q = tmp_path / "lm2.txt"
    q.write_text("dataset_name = lm\nbop_path = /tmp/nowhere\n")
    cfg2 = resolve_cfg_lm(str(q))
    assert len(cfg2["obj_names"]) == 13


def test_solver_kwargs_reference_flag_mapping():
    """Reference test-CLI solver flags (test.py:553-558, test_lm.py:438-441)
    map onto the batched solver's knobs via cli.common.solver_kwargs."""
    from checkerpose_tpu.cli.common import solver_kwargs
    # defaults: plain EPnP-RANSAC, no coherence, 2 px, 128 hyp
    kw = solver_kwargs({})
    assert kw == {"num_hyp": 128, "reproj_thresh": 2.0,
                  "soft_inlier_sigma": 0.0, "coherence_weight": 0.0,
                  "neighborhood_radius": 20.0}
    # progressivex branch: soft inliers + Potts coherence, prog_max_iters
    # drives the hypothesis count, ball radius / coherence tunable
    kw = solver_kwargs({"use_progressivex": True, "prog_max_iters": 400,
                        "nbr_ball_radius": 15.0,
                        "spatial_coherence_weight": 0.3,
                        "reprojErr_thresh": 4.0})
    assert kw["num_hyp"] == 400 and kw["soft_inlier_sigma"] == 0.5
    assert kw["coherence_weight"] == pytest.approx(0.3)
    assert kw["neighborhood_radius"] == pytest.approx(15.0)
    assert kw["reproj_thresh"] == pytest.approx(4.0)
    # cv branch: cv_max_iters only applies without progressivex;
    # an explicit pnp_num_hyp always wins
    assert solver_kwargs({"cv_max_iters": 150})["num_hyp"] == 150
    assert solver_kwargs({"use_progressivex": True,
                          "cv_max_iters": 150})["num_hyp"] == 128
    assert solver_kwargs({"cv_max_iters": 150,
                          "pnp_num_hyp": 64})["num_hyp"] == 64


def test_checkpoint_dir_arg_accepts_reference_ckpt_file(tmp_path):
    from checkerpose_tpu.cli.common import checkpoint_dir_arg
    f = tmp_path / "0.449step22800"
    f.write_text("x")
    assert checkpoint_dir_arg(None, str(f)) == str(tmp_path)
    assert checkpoint_dir_arg(None, str(tmp_path)) == str(tmp_path)
    assert checkpoint_dir_arg("explicit", str(f)) == "explicit"
    assert checkpoint_dir_arg(None, None) is None


def test_load_pretrained_init_lm_defaults_to_lm13(tmp_path):
    """Without obj_name (LM multi-object path), the pretrain graft looks
    under <root>/lm13 and degrades to None when absent (no KeyError)."""
    from checkerpose_tpu.cli.train import load_pretrained_init
    cfg = {"init_pretrained_root": str(tmp_path / "missing")}
    assert load_pretrained_init(cfg, None, 256) is None
