// tcs_io: native data-loading core for tcs_tpu.
//
// The reference delegates its data path to torch DataLoader workers (C++
// under the hood) plus cv2/PIL decoders; this library is the tcs_tpu
// equivalent: PNG/JPEG/PFM decode and bilinear resize implemented in C++,
// exposed through a C ABI consumed via ctypes. Python calls release the GIL
// for the duration of each call, so a ThreadPoolExecutor achieves real
// decode parallelism without worker processes.
//
// Build: make -C native  (produces libtcs_io.so)

#include <png.h>
#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

// Returns 0 on success. Fills width/height/channels/bit_depth.
int tcs_png_info(const char* path, int* width, int* height, int* channels,
                 int* bit_depth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  int ch = 1;
  if (color == PNG_COLOR_TYPE_RGB) ch = 3;
  else if (color == PNG_COLOR_TYPE_RGBA) ch = 4;
  else if (color == PNG_COLOR_TYPE_GRAY_ALPHA) ch = 2;
  else if (color == PNG_COLOR_TYPE_PALETTE) ch = 3;
  *channels = ch;
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode into caller buffer (row-major H*W*channels).
// For bit_depth 16 the output is uint16 (native endianness); else uint8.
int tcs_png_read(const char* path, unsigned char* out, int out_bytes) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_swap(png);  // little-endian out
  png_read_update_info(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  if ((int)(rowbytes * h) > out_bytes) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct TcsJpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void tcs_jpeg_error_exit(j_common_ptr cinfo) {
  TcsJpegErr* err = reinterpret_cast<TcsJpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int tcs_jpeg_info(const char* path, int* width, int* height, int* channels) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  TcsJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = tcs_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  *channels = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

int tcs_jpeg_read(const char* path, unsigned char* out, int out_bytes) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  TcsJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = tcs_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int row = cinfo.output_width * cinfo.output_components;
  if ((int)(row * cinfo.output_height) > out_bytes) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* rowptr = out + cinfo.output_scanline * row;
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// PFM (SceneFlow disparity)
// ---------------------------------------------------------------------------

int tcs_pfm_info(const char* path, int* width, int* height, int* channels) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  char tag[3] = {0};
  if (fscanf(fp, "%2s", tag) != 1) { fclose(fp); return 2; }
  if (tag[0] != 'P' || (tag[1] != 'f' && tag[1] != 'F')) { fclose(fp); return 2; }
  *channels = (tag[1] == 'F') ? 3 : 1;
  if (fscanf(fp, "%d %d", width, height) != 2) { fclose(fp); return 2; }
  fclose(fp);
  return 0;
}

// Output is top-down H*W*C float32 (PFM stores bottom-up).
int tcs_pfm_read(const char* path, float* out, int out_floats) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  char tag[3] = {0};
  int w, h;
  float scale;
  if (fscanf(fp, "%2s %d %d %f", tag, &w, &h, &scale) != 4) {
    fclose(fp);
    return 2;
  }
  fgetc(fp);  // single whitespace after header
  int ch = (tag[1] == 'F') ? 3 : 1;
  long n = (long)w * h * ch;
  if (n > out_floats) { fclose(fp); return 3; }
  std::vector<float> raw(n);
  if (fread(raw.data(), sizeof(float), n, fp) != (size_t)n) {
    fclose(fp);
    return 4;
  }
  fclose(fp);
  bool little = scale < 0;
  if (!little) {  // big-endian file → byteswap
    unsigned char* b = reinterpret_cast<unsigned char*>(raw.data());
    for (long i = 0; i < n; ++i) {
      std::swap(b[4 * i + 0], b[4 * i + 3]);
      std::swap(b[4 * i + 1], b[4 * i + 2]);
    }
  }
  // flip vertically
  long rowf = (long)w * ch;
  for (int y = 0; y < h; ++y)
    memcpy(out + (long)(h - 1 - y) * rowf, raw.data() + (long)y * rowf,
           rowf * sizeof(float));
  return 0;
}

// ---------------------------------------------------------------------------
// Bilinear resize (half-pixel centres — cv2.INTER_LINEAR semantics, matching
// tcs_tpu.data.augmentor._resize_bilinear_np)
// ---------------------------------------------------------------------------

void tcs_resize_bilinear_f32(const float* in, int H, int W, int C, float* out,
                             int H2, int W2) {
  std::vector<int> x0v(W2), x1v(W2);
  std::vector<float> fxv(W2);
  for (int x = 0; x < W2; ++x) {
    float sx = (x + 0.5f) * (float)W / W2 - 0.5f;
    int x0 = (int)std::floor(sx);
    float fx = sx - x0;
    if (x0 < 0) { x0 = 0; fx = 0.f; }
    int x1 = std::min(x0 + 1, W - 1);
    if (x0 > W - 1) { x0 = W - 1; fx = 0.f; x1 = W - 1; }
    x0v[x] = x0; x1v[x] = x1; fxv[x] = std::min(std::max(fx, 0.f), 1.f);
  }
  for (int y = 0; y < H2; ++y) {
    float sy = (y + 0.5f) * (float)H / H2 - 0.5f;
    int y0 = (int)std::floor(sy);
    float fy = sy - y0;
    if (y0 < 0) { y0 = 0; fy = 0.f; }
    int y1 = std::min(y0 + 1, H - 1);
    if (y0 > H - 1) { y0 = H - 1; fy = 0.f; y1 = H - 1; }
    fy = std::min(std::max(fy, 0.f), 1.f);
    const float* r0 = in + (long)y0 * W * C;
    const float* r1 = in + (long)y1 * W * C;
    float* orow = out + (long)y * W2 * C;
    for (int x = 0; x < W2; ++x) {
      const float fx = fxv[x];
      const float* p00 = r0 + (long)x0v[x] * C;
      const float* p01 = r0 + (long)x1v[x] * C;
      const float* p10 = r1 + (long)x0v[x] * C;
      const float* p11 = r1 + (long)x1v[x] * C;
      for (int c = 0; c < C; ++c) {
        float top = p00[c] * (1 - fx) + p01[c] * fx;
        float bot = p10[c] * (1 - fx) + p11[c] * fx;
        orow[(long)x * C + c] = top * (1 - fy) + bot * fy;
      }
    }
  }
}

void tcs_resize_bilinear_u8(const unsigned char* in, int H, int W, int C,
                            float* out, int H2, int W2) {
  // Convert-on-the-fly variant for uint8 images.
  std::vector<float> tmp((long)H * W * C);
  for (long i = 0; i < (long)H * W * C; ++i) tmp[i] = in[i];
  tcs_resize_bilinear_f32(tmp.data(), H, W, C, out, H2, W2);
}

// ---------------------------------------------------------------------------
// Photometric color jitter (torchvision ColorJitter + gamma semantics,
// matching tcs_tpu.data.augmentor.ColorJitter's numpy oracle; see
// reference core/utils/augmentor.py:310-351). This is the hot op of the
// input pipeline — the numpy HSV round-trip costs ~2.4 s per frame_length=4
// sample at 480×640, starving the train step. Values are 0..255 float32,
// clipped per op exactly like the numpy path; the caller rounds to uint8.
// ---------------------------------------------------------------------------

static inline float tcs_clip255(float v) {
  return v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
}

static inline float tcs_gray(const float* p) {
  // ITU-R 601-2 luma (PIL convert('L') weights)
  return 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
}

// Rotate hue of one RGB pixel (0..255 floats) by hue_shift turns.
// Mirrors _rgb_to_hsv/_hsv_to_rgb in tcs_tpu/data/augmentor.py, including
// the tie-breaking order (r==max wins over g==max).
static inline void tcs_hue_rotate_px(float* px, float hue_shift) {
  float r = px[0] / 255.f, g = px[1] / 255.f, b = px[2] / 255.f;
  float maxc = std::max(r, std::max(g, b));
  float minc = std::min(r, std::min(g, b));
  float v = maxc;
  float deltac = maxc - minc;
  float s = maxc > 0.f ? deltac / std::max(maxc, 1e-12f) : 0.f;
  float h;
  if (deltac == 0.f) {
    h = 0.f;
  } else {
    float rc = (maxc - r) / deltac;
    float gc = (maxc - g) / deltac;
    float bc = (maxc - b) / deltac;
    if (r == maxc) h = bc - gc;
    else if (g == maxc) h = 2.f + rc - bc;
    else h = 4.f + gc - rc;
    h = h / 6.f;
    h = h - std::floor(h);  // python % 1.0 (non-negative)
  }
  h = h + hue_shift;
  h = h - std::floor(h);
  float hf = h * 6.f;
  int i = (int)std::floor(hf) % 6;
  float f = hf - std::floor(hf);
  float p = v * (1.f - s);
  float q = v * (1.f - s * f);
  float t = v * (1.f - s * (1.f - f));
  float ro, go, bo;
  switch (i) {
    case 0: ro = v; go = t; bo = p; break;
    case 1: ro = q; go = v; bo = p; break;
    case 2: ro = p; go = v; bo = t; break;
    case 3: ro = p; go = q; bo = v; break;
    case 4: ro = t; go = p; bo = v; break;
    default: ro = v; go = p; bo = q; break;
  }
  px[0] = ro * 255.f;
  px[1] = go * 255.f;
  px[2] = bo * 255.f;
}

// img: in/out H*W*3 float32 (0..255). order: 4 op codes, a permutation of
// {0: brightness, 1: contrast, 2: saturation, 3: hue}. Gamma applied last.
void tcs_color_jitter(float* img, long npx, const int* order,
                      float f_brightness, float f_contrast,
                      float f_saturation, float hue_shift, float gamma,
                      float gain) {
  const long n = npx * 3;
  for (int k = 0; k < 4; ++k) {
    switch (order[k]) {
      case 0: {  // brightness: blend with zeros
        for (long i = 0; i < n; ++i)
          img[i] = tcs_clip255(f_brightness * img[i]);
        break;
      }
      case 1: {  // contrast: blend with current grayscale mean
        double acc = 0.0;
        for (long i = 0; i < npx; ++i) acc += tcs_gray(img + 3 * i);
        const float mean = (float)(acc / (double)npx);
        const float base = (1.f - f_contrast) * mean;
        for (long i = 0; i < n; ++i)
          img[i] = tcs_clip255(f_contrast * img[i] + base);
        break;
      }
      case 2: {  // saturation: blend each pixel with its own gray
        for (long i = 0; i < npx; ++i) {
          float* p = img + 3 * i;
          const float gy = tcs_gray(p);
          const float base = (1.f - f_saturation) * gy;
          p[0] = tcs_clip255(f_saturation * p[0] + base);
          p[1] = tcs_clip255(f_saturation * p[1] + base);
          p[2] = tcs_clip255(f_saturation * p[2] + base);
        }
        break;
      }
      default: {  // hue
        for (long i = 0; i < npx; ++i) tcs_hue_rotate_px(img + 3 * i, hue_shift);
        break;
      }
    }
  }
  if (gamma != 1.0f || gain != 1.0f) {
    for (long i = 0; i < n; ++i)
      img[i] = tcs_clip255(255.f * gain * std::pow(img[i] / 255.f, gamma));
  }
}

int tcs_version() { return 2; }

}  // extern "C"
