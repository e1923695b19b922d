// Native wav I/O + batch loader for the host data pipeline.
//
// The reference pipeline decodes wavs in 12 librosa worker processes
// (models/<VARIANT>/dataset.py, configs.yaml:24-28).  Python threads serialize
// on the GIL for the decode+convert inner loop; this small library does
// RIFF/PCM parsing and int16->float32 conversion in C++, with a pthread pool
// for whole-batch loads, exposed through a plain C ABI consumed via ctypes
// (no pybind11 in this image).
//
// Supported: PCM16 / PCM24 / PCM32 / IEEE float32, mono or averaged
// multi-channel, standard RIFF chunk walking.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
  float* samples = nullptr;
  int64_t n = 0;
  int32_t rate = 0;
};

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;       // 1 = PCM, 3 = IEEE float
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

int read_wav_impl(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  RiffHeader rh;
  if (std::fread(&rh, sizeof rh, 1, f) != 1 ||
      std::memcmp(rh.riff, "RIFF", 4) != 0 ||
      std::memcmp(rh.wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return -2;
  }
  FmtChunk fmt{};
  bool have_fmt = false;
  std::vector<uint8_t> data;
  ChunkHeader ch;
  while (std::fread(&ch, sizeof ch, 1, f) == 1) {
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      uint32_t want = ch.size < sizeof fmt ? ch.size : (uint32_t)sizeof fmt;
      if (std::fread(&fmt, want, 1, f) != 1) { std::fclose(f); return -3; }
      if (ch.size > want) std::fseek(f, ch.size - want, SEEK_CUR);
      have_fmt = true;
    } else if (std::memcmp(ch.id, "data", 4) == 0) {
      data.resize(ch.size);
      if (ch.size && std::fread(data.data(), 1, ch.size, f) != ch.size) {
        std::fclose(f);
        return -4;
      }
    } else {
      std::fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
    if (have_fmt && !data.empty()) break;
  }
  std::fclose(f);
  if (!have_fmt || data.empty() || fmt.channels == 0) return -5;

  const int ch_n = fmt.channels;
  const int bytes_per = fmt.bits / 8;
  if (bytes_per == 0) return -6;
  const int64_t frames = (int64_t)data.size() / (bytes_per * ch_n);
  float* buf = (float*)std::malloc(sizeof(float) * frames);
  if (!buf) return -7;

  const uint8_t* p = data.data();
  const float inv_ch = 1.0f / ch_n;
  for (int64_t i = 0; i < frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < ch_n; ++c) {
      const uint8_t* s = p + (i * ch_n + c) * bytes_per;
      float v = 0.f;
      if (fmt.format == 3 && fmt.bits == 32) {
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (fmt.bits == 16) {
        int16_t iv;
        std::memcpy(&iv, s, 2);
        v = (float)iv / 32768.0f;
      } else if (fmt.bits == 32) {
        int32_t iv;
        std::memcpy(&iv, s, 4);
        v = (float)iv / 2147483648.0f;
      } else if (fmt.bits == 24) {
        int32_t iv = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                               (uint32_t)s[2] << 24) >> 8;
        v = (float)iv / 8388608.0f;
      } else if (fmt.bits == 8) {
        v = ((float)s[0] - 128.0f) / 128.0f;
      } else {
        std::free(buf);
        return -8;
      }
      acc += v;
    }
    buf[i] = acc * inv_ch;
  }
  out->samples = buf;
  out->n = frames;
  out->rate = (int32_t)fmt.sample_rate;
  return 0;
}

}  // namespace

extern "C" {

// Read one wav into a malloc'd float32 mono buffer.  Returns 0 on success.
int sep_read_wav(const char* path, float** samples, int64_t* n_samples,
                 int32_t* sample_rate) {
  WavData w;
  int rc = read_wav_impl(path, &w);
  if (rc != 0) return rc;
  *samples = w.samples;
  *n_samples = w.n;
  *sample_rate = w.rate;
  return 0;
}

void sep_free(float* p) { std::free(p); }

// Load a batch of wavs in parallel (pthread pool), each cropped to
// crop_len samples from the given offset (offset < 0: no crop; shorter
// files are zero-padded).  out is caller-allocated [batch, crop_len].
// rates/lengths are caller-allocated [batch].  Returns 0 if every file
// loaded, else the first nonzero error code.
int sep_read_wav_batch(const char** paths, int32_t batch,
                       const int64_t* offsets, int64_t crop_len,
                       float* out, int64_t* lengths, int32_t* rates) {
  std::vector<int> rc(batch, 0);
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;
  std::vector<std::thread> threads;
  std::atomic<int32_t>* counter = new std::atomic<int32_t>(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = counter->fetch_add(1);
      if (i >= batch) break;
      WavData w;
      rc[i] = read_wav_impl(paths[i], &w);
      if (rc[i] != 0) continue;
      lengths[i] = w.n;
      rates[i] = w.rate;
      float* dst = out + (int64_t)i * crop_len;
      int64_t off = offsets ? offsets[i] : 0;
      if (off < 0) off = 0;
      int64_t avail = w.n > off ? w.n - off : 0;
      int64_t copy = avail < crop_len ? avail : crop_len;
      std::memcpy(dst, w.samples + off, sizeof(float) * copy);
      if (copy < crop_len)
        std::memset(dst + copy, 0, sizeof(float) * (crop_len - copy));
      std::free(w.samples);
    }
  };
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  delete counter;
  for (int i = 0; i < batch; ++i)
    if (rc[i] != 0) return rc[i];
  return 0;
}

}  // extern "C"
