// loadercore: native host-side data-loading core for checkerpose_tpu.
//
// Replaces the per-sample Python/cv2 path in data/dataset.py with one C call
// per BATCH: PNG/JPEG decode (libpng/libjpeg), zero-padded square crop and
// resize (bilinear for RGB at crop_img, nearest for the two masks at
// crop_gt), written straight into caller-provided batch buffers. A pthread
// pool overlaps file IO and decode across samples.
//
// Geometry matches ops/crop.py (and thus the reference's
// bop_dataset_pytorch.py:55-108 + cv2.resize semantics):
//   * square crop: bbox expanded about center to side max(bw, bh), int-
//     truncated corners, out-of-image area zero-filled
//   * bilinear: src = (dst + 0.5) * scale - 0.5, edge-clamped taps, taps
//     outside the crop read 0 (the zero padding)
//   * nearest: src = floor(dst * scale)
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>
#include <string>
#include <thread>
#include <atomic>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

bool load_png(const char* path, Image* out, bool gray) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (gray) {
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE)
      png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  } else {
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
  }
  png_read_update_info(png, info);

  int ch = gray ? 1 : 3;
  out->w = (int)w; out->h = (int)h; out->c = ch;
  out->data.resize((size_t)w * h * ch);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + (size_t)y * w * ch;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool load_jpeg(const char* path, Image* out, bool gray) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height, ch = cinfo.output_components;
  out->w = w; out->h = h; out->c = ch;
  out->data.resize((size_t)w * h * ch);
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool load_image(const char* path, Image* out, bool gray) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".jpg") == 0 || strcmp(path + n - 5, ".jpeg") == 0))
    return load_jpeg(path, out, gray);
  return load_png(path, out, gray);
}

// Square crop about bbox center (int-truncated), zero padding outside image.
// Returns crop origin (x1, y1) and side; src reads go through this mapping.
struct SquareCrop {
  int x1, y1, side;
  int w, h;  // copy extent int(x2)-int(x1) / int(y2)-int(y1): can be side-1
             // after truncation; the remainder stays ZERO like the reference
};

SquareCrop square_crop(const double* bbox) {
  double x1 = bbox[0], y1 = bbox[1], bw = bbox[2], bh = bbox[3];
  double x2 = x1 + bw, y2 = y1 + bh;
  double cx = 0.5 * (x1 + x2), cy = 0.5 * (y1 + y2);
  if (bh > bw) {
    x1 = cx - bh / 2; x2 = cx + bh / 2;
  } else {
    y1 = cy - bw / 2; y2 = cy + bw / 2;
  }
  SquareCrop sc;
  sc.x1 = (int)x1;  // C cast truncates toward zero, matching numpy int()
  sc.y1 = (int)y1;
  sc.side = (int)(bh > bw ? bh : bw);
  // reference parity (bop_dataset_pytorch.py:83-89 / ops/crop.py): the copy
  // region is int(x2)-int(x1) x int(y2)-int(y1) inside the side x side
  // canvas; truncation can make it one col/row smaller than `side`, and
  // that last col/row must read 0 even where the image has pixels
  sc.w = (int)x2 - sc.x1;
  sc.h = (int)y2 - sc.y1;
  return sc;
}

inline uint8_t read_px(const Image& im, const SquareCrop& sc, int cy, int cx, int ch) {
  // coordinates are within the virtual zero-padded square crop
  int sx = sc.x1 + cx, sy = sc.y1 + cy;
  if (sx < 0 || sy < 0 || sx >= im.w || sy >= im.h || cx < 0 || cy < 0 ||
      cx >= sc.w || cy >= sc.h || cx >= sc.side || cy >= sc.side)
    return 0;
  return im.data[((size_t)sy * im.w + sx) * im.c + ch];
}

// Materialize the zero-padded square crop: rows that intersect the image AND
// the reference's copy region are memcpy'd, everything else is zero.
// Returns side x side x C contiguous.
void materialize_crop(const Image& im, const SquareCrop& sc,
                      std::vector<uint8_t>* buf) {
  int C = im.c, side = sc.side;
  buf->assign((size_t)side * side * C, 0);
  int cx0 = sc.x1 < 0 ? -sc.x1 : 0;                 // first crop col inside image
  int sx0 = sc.x1 < 0 ? 0 : sc.x1;                  // matching image col
  int ncols = std::min({im.w - sx0, side - cx0, sc.w - cx0});
  if (ncols <= 0) return;
  int nrows = std::min(sc.h, side);
  for (int cy = 0; cy < nrows; ++cy) {
    int sy = sc.y1 + cy;
    if (sy < 0 || sy >= im.h) continue;
    memcpy(buf->data() + ((size_t)cy * side + cx0) * C,
           im.data.data() + ((size_t)sy * im.w + sx0) * C,
           (size_t)ncols * C);
  }
}

struct Taps {
  std::vector<int> i0, i1;      // clamped tap indices
  std::vector<float> w;         // weight of tap 1 (0 at borders, cv2-style)
};

Taps make_taps(int side, int out_size) {
  Taps t;
  t.i0.resize(out_size); t.i1.resize(out_size); t.w.resize(out_size);
  double scale = (double)side / out_size;
  for (int o = 0; o < out_size; ++o) {
    double s = (o + 0.5) * scale - 0.5;
    int i0 = (int)floor(s);
    double w = s - i0;
    if (i0 < 0) { i0 = 0; w = 0.0; }
    if (i0 + 1 > side - 1) { w = 0.0; }
    t.i0[o] = i0 < side - 1 ? i0 : side - 1;
    t.i1[o] = (i0 + 1) < side - 1 ? (i0 + 1) : side - 1;
    t.w[o] = (float)w;
  }
  return t;
}

void resize_bilinear_u8(const Image& im, const SquareCrop& sc, int out_size,
                        uint8_t* out /* out_size*out_size*3 */) {
  std::vector<uint8_t> cropbuf;
  materialize_crop(im, sc, &cropbuf);
  int side = sc.side;
  Taps tx = make_taps(side, out_size);
  Taps ty = make_taps(side, out_size);
  // horizontal pass into a 2-row float cache per output row (side is small;
  // simpler: full horizontal pass for the two needed source rows each time,
  // cached by row index)
  std::vector<float> row_cache(2 * (size_t)out_size * 3);
  int cached[2] = {-1, -1};

  auto hpass = [&](int sy, float* dst) {
    const uint8_t* src = cropbuf.data() + (size_t)sy * side * 3;
    for (int ox = 0; ox < out_size; ++ox) {
      const uint8_t* a = src + (size_t)tx.i0[ox] * 3;
      const uint8_t* b = src + (size_t)tx.i1[ox] * 3;
      float w = tx.w[ox], iw = 1.0f - w;
      dst[ox * 3 + 0] = a[0] * iw + b[0] * w;
      dst[ox * 3 + 1] = a[1] * iw + b[1] * w;
      dst[ox * 3 + 2] = a[2] * iw + b[2] * w;
    }
  };

  for (int oy = 0; oy < out_size; ++oy) {
    int y0 = ty.i0[oy], y1 = ty.i1[oy];
    float wy = ty.w[oy], iwy = 1.0f - wy;
    float* r0;
    float* r1;
    if (cached[0] == y0) r0 = row_cache.data();
    else { hpass(y0, row_cache.data()); cached[0] = y0; r0 = row_cache.data(); }
    if (y1 == y0) r1 = r0;
    else if (cached[1] == y1) r1 = row_cache.data() + (size_t)out_size * 3;
    else { hpass(y1, row_cache.data() + (size_t)out_size * 3); cached[1] = y1;
           r1 = row_cache.data() + (size_t)out_size * 3; }
    uint8_t* dst = out + (size_t)oy * out_size * 3;
    for (int i = 0; i < out_size * 3; ++i)
      dst[i] = (uint8_t)(r0[i] * iwy + r1[i] * wy + 0.5f);
  }
}

void resize_nearest_f32(const Image& im, const SquareCrop& sc, int out_size,
                        float* out /* out_size*out_size, mask / 255 */) {
  double scale = (double)sc.side / out_size;
  std::vector<int> xs(out_size);
  for (int ox = 0; ox < out_size; ++ox) xs[ox] = (int)floor(ox * scale);
  constexpr float inv255 = 1.0f / 255.0f;
  for (int oy = 0; oy < out_size; ++oy) {
    int sy = (int)floor(oy * scale);
    int iy = sc.y1 + sy;
    float* dst = out + (size_t)oy * out_size;
    if (iy < 0 || iy >= im.h || sy >= sc.side) {
      memset(dst, 0, sizeof(float) * out_size);
      continue;
    }
    const uint8_t* src = im.data.data() + (size_t)iy * im.w;
    for (int ox = 0; ox < out_size; ++ox) {
      int ix = sc.x1 + xs[ox];
      dst[ox] = (ix < 0 || ix >= im.w || xs[ox] >= sc.side) ? 0.0f
                : src[ix] * inv255;
    }
  }
}

}  // namespace

extern "C" {

// Load one sample. Returns 0 on success, nonzero error code otherwise.
int lc_load_sample(const char* rgb_path, const char* mask_path,
                   const char* mask_visib_path, const double* bbox,
                   int crop_img, int crop_gt, uint8_t* out_img,
                   float* out_mask_full, float* out_mask_visib,
                   int* out_img_wh /* 2 ints: image w, h (for final bbox) */) {
  Image rgb, mfull, mvis;
  if (!load_image(rgb_path, &rgb, false)) return 1;
  if (!load_image(mask_path, &mfull, true)) return 2;
  if (!load_image(mask_visib_path, &mvis, true)) return 3;
  SquareCrop sc = square_crop(bbox);
  if (sc.side <= 0) return 4;
  resize_bilinear_u8(rgb, sc, crop_img, out_img);
  resize_nearest_f32(mfull, sc, crop_gt, out_mask_full);
  resize_nearest_f32(mvis, sc, crop_gt, out_mask_visib);
  if (out_img_wh) { out_img_wh[0] = rgb.w; out_img_wh[1] = rgb.h; }
  return 0;
}

// Batched loading with an internal thread pool. paths are arrays of B
// C-strings; bboxes is B x 4 doubles; outputs are contiguous batch buffers.
// Returns the number of failed samples (their buffers are zero-filled).
int lc_load_batch(int batch, const char** rgb_paths, const char** mask_paths,
                  const char** mask_visib_paths, const double* bboxes,
                  int crop_img, int crop_gt, uint8_t* out_imgs,
                  float* out_masks_full, float* out_masks_visib,
                  int num_threads) {
  std::atomic<int> next(0), failures(0);
  size_t img_stride = (size_t)crop_img * crop_img * 3;
  size_t gt_stride = (size_t)crop_gt * crop_gt;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      uint8_t* oi = out_imgs + (size_t)i * img_stride;
      float* omf = out_masks_full + (size_t)i * gt_stride;
      float* omv = out_masks_visib + (size_t)i * gt_stride;
      int rc = lc_load_sample(rgb_paths[i], mask_paths[i], mask_visib_paths[i],
                              bboxes + (size_t)i * 4, crop_img, crop_gt, oi,
                              omf, omv, nullptr);
      if (rc != 0) {
        memset(oi, 0, img_stride);
        memset(omf, 0, gt_stride * sizeof(float));
        memset(omv, 0, gt_stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > batch) nt = batch;
  std::vector<std::thread> threads;
  for (int t = 1; t < nt; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return failures.load();
}

int lc_version() { return 1; }

}  // extern "C"
