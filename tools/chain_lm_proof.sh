#!/bin/bash
# Round-3 chain supervisor: wait for the single-object proof driver
# (tools/run_synth_proof.sh, PID in $1) to exit, then run the multi-object
# LM proof (tools/run_synth_proof_lm.sh). Serialized because two axon-tunnel
# TPU clients contend (NOTES_ROUND2.md env lessons).
set -u
WAIT_PID=${1:?usage: chain_lm_proof.sh <pid-to-wait-for>}
cd /root/repo
echo "chain: waiting for pid $WAIT_PID (single-object proof driver)" >&2
while kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 60
done
echo "chain: pid $WAIT_PID exited at $(date -u +%H:%M:%S); launching LM proof" >&2
exec bash tools/run_synth_proof_lm.sh
