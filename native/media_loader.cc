// Native host-side media decode for the data loader.
//
// The reference leans on external native code for its media pipeline —
// OpenCV for video frames (preprocess_data.py:42-86), PIL/libjpeg +
// torchvision transforms per training step (llm_trainer.py:151-158,
// 308-323), ffmpeg for audio demux. This library is the TPU framework's
// own native equivalent: libjpeg decode + area-average/bilinear resize +
// center crop producing CLIP-ready uint8 tensors, and WAV PCM decode with
// Whisper pad-or-trim semantics. Exposed as a C ABI consumed via ctypes
// (the GIL is released during calls, so a Python thread pool gets true
// parallel decode).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC ... -ljpeg).

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize HWC uint8 -> HWC uint8.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw, int channels) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int y0 = std::max(0, std::min(sh - 1, static_cast<int>(fy)));
    const int y1 = std::min(sh - 1, y0 + 1);
    const float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < dw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int x0 = std::max(0, std::min(sw - 1, static_cast<int>(fx)));
      const int x1 = std::min(sw - 1, x0 + 1);
      const float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int c = 0; c < channels; ++c) {
        const float v00 = src[(y0 * sw + x0) * channels + c];
        const float v01 = src[(y0 * sw + x1) * channels + c];
        const float v10 = src[(y1 * sw + x0) * channels + c];
        const float v11 = src[(y1 * sw + x1) * channels + c];
        const float top = v00 + (v01 - v00) * wx;
        const float bot = v10 + (v11 - v10) * wx;
        dst[(y * dw + x) * channels + c] =
            static_cast<uint8_t>(std::lround(top + (bot - top) * wy));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode a JPEG from memory, resize shortest side to `target`, center-crop
// to target x target, write uint8 RGB HWC into `out` (target*target*3).
// Returns 0 on success, negative on error.
int macaw_decode_jpeg_crop(const uint8_t* data, long len, int target,
                           uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  // libjpeg DCT scaling: pick the smallest 1/N that keeps the shortest
  // side >= target (cheap coarse downscale before bilinear).
  jpeg_calc_output_dimensions(&cinfo);
  const int full_short = std::min<int>(cinfo.output_width,
                                       cinfo.output_height);
  int denom = 1;
  while (denom < 8 && full_short / (denom * 2) >= target) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;
  if (ch != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline)
                   * w * ch;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // resize shortest side to target, preserving aspect
  int nw, nh;
  if (w < h) {
    nw = target;
    nh = std::max(target,
                  static_cast<int>(std::lround(
                      static_cast<double>(target) * h / w)));
  } else {
    nh = target;
    nw = std::max(target,
                  static_cast<int>(std::lround(
                      static_cast<double>(target) * w / h)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
  resize_bilinear(buf.data(), h, w, resized.data(), nh, nw, 3);

  const int top = (nh - target) / 2;
  const int left = (nw - target) / 2;
  for (int y = 0; y < target; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                resized.data()
                    + (static_cast<size_t>(top + y) * nw + left) * 3,
                static_cast<size_t>(target) * 3);
  }
  return 0;
}

// Read a RIFF/WAVE file (PCM8/PCM16/PCM32 or float32, 1-16 channels),
// downmix to mono, linearly resample to `target_rate`, and pad-or-trim
// to `target_len` samples into `out` (the whisper load_audio +
// pad_or_trim contract, reference llm_trainer.py:335-338 — whisper
// resamples via ffmpeg; linear interpolation here is the documented
// divergence, adequate for speech features).
// Returns the source sample rate on success, negative on error.
// All header fields are validated before use and every allocation is
// bounded by the actual file size, so malformed/hostile WAV bytes get an
// error code instead of SIGFPE/OOM (this function is reachable from the
// HTTP serving endpoint via audio_b64).
int macaw_load_wav(const char* path, float* out, long target_len,
                   int target_rate) {
  if (target_len <= 0 || target_rate <= 0) return -6;
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long file_size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long data_pos = -1;
  uint32_t data_len = 0;
  char id[4];
  uint32_t sz;
  while (std::fread(id, 1, 4, f) == 4 && std::fread(&sz, 4, 1, f) == 1) {
    if (!std::memcmp(id, "fmt ", 4)) {
      uint8_t hdr[16];
      if (sz < 16 || std::fread(hdr, 1, 16, f) != 16) {
        std::fclose(f);
        return -3;
      }
      std::memcpy(&fmt, hdr, 2);
      std::memcpy(&channels, hdr + 2, 2);
      std::memcpy(&rate, hdr + 4, 4);
      std::memcpy(&bits, hdr + 14, 2);
      if (sz > 16) std::fseek(f, sz - 16, SEEK_CUR);
    } else if (!std::memcmp(id, "data", 4)) {
      data_pos = std::ftell(f);
      data_len = sz;
      std::fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    } else {
      std::fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    }
  }
  // fmt-chunk validation: PCM(1) 8/16/32-bit or IEEE-float(3) 32-bit,
  // sane channel count and rate; declared data length clamped to what the
  // file actually holds (attacker-controlled data_len must not drive the
  // allocation).
  const bool fmt_ok =
      (fmt == 1 && (bits == 8 || bits == 16 || bits == 32)) ||
      (fmt == 3 && bits == 32);
  if (data_pos < 0 || !fmt_ok || channels < 1 || channels > 16 ||
      rate < 1000 || rate > 192000) {
    std::fclose(f);
    return -4;
  }
  if (data_pos + static_cast<long>(data_len) > file_size) {
    data_len = static_cast<uint32_t>(file_size - data_pos);
  }
  std::fseek(f, data_pos, SEEK_SET);
  const int bytes_per = bits / 8;
  const long frame_bytes = static_cast<long>(bytes_per) * channels;
  long n_frames = static_cast<long>(data_len) / frame_bytes;
  // only read the frames the resampled output can consume
  const long needed = static_cast<long>(
      static_cast<double>(target_len) * rate / target_rate) + 2;
  n_frames = std::min(n_frames, needed);
  const size_t read_bytes = static_cast<size_t>(n_frames) * frame_bytes;
  std::vector<uint8_t> raw(read_bytes);
  if (std::fread(raw.data(), 1, read_bytes, f) != read_bytes) {
    std::fclose(f);
    return -5;
  }
  std::fclose(f);

  std::vector<float> mono(static_cast<size_t>(std::max<long>(n_frames, 1)),
                          0.0f);
  for (long i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = raw.data()
          + (static_cast<size_t>(i) * channels + c) * bytes_per;
      float v = 0.0f;
      if (fmt == 3) {                        // IEEE float32
        std::memcpy(&v, p, 4);
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = s / 32768.0f;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = s / 2147483648.0f;
      } else {                               // PCM8 is unsigned
        v = (p[0] - 128) / 128.0f;
      }
      acc += v;
    }
    mono[i] = acc / channels;
  }

  if (static_cast<int>(rate) == target_rate) {
    const long n_out = std::min(n_frames, target_len);
    std::memcpy(out, mono.data(), static_cast<size_t>(n_out) * 4);
    for (long i = n_out; i < target_len; ++i) out[i] = 0.0f;
  } else {
    const double step = static_cast<double>(rate) / target_rate;
    for (long i = 0; i < target_len; ++i) {
      const double pos = i * step;
      const long i0 = static_cast<long>(pos);
      if (i0 + 1 < n_frames) {
        const float w = static_cast<float>(pos - i0);
        out[i] = mono[i0] + (mono[i0 + 1] - mono[i0]) * w;
      } else if (i0 < n_frames) {
        out[i] = mono[i0];
      } else {
        out[i] = 0.0f;
      }
    }
  }
  return static_cast<int>(rate);
}

}  // extern "C"
