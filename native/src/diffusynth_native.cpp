// diffusynth_native: host-side audio runtime for the TPU framework.
//
// The TPU owns all NN compute (JAX/XLA); this library owns the host-side
// data plane around it, replacing the reference's per-sample Python loops
// (reference: webUI/.../utils.py:229-245 per-item CPU decode,
// track_maker.py:131-147 serial mixdown) with native, parallel code:
//
//   * WAV read/write (PCM16 + float32), no soundfile/librosa dependency
//   * peak/RMS normalization over batches
//   * track mixdown: scatter-add N rendered notes into track buffers at
//     sample offsets (the hot host loop of MIDI rendering)
//   * a lock-free-ish threaded prefetch ring used by the training data
//     loader to overlap HDF5/disk reads with device steps
//
// C ABI only (consumed via ctypes from diffusynth_tpu/native/audio.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV IO (RIFF PCM16 / IEEE float32, mono or interleaved)
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int64_t frames;     // samples per channel
  int32_t format;     // 1 = PCM16, 3 = float32
};

static bool read_chunk_header(FILE* f, char id[5], uint32_t* size) {
  if (fread(id, 1, 4, f) != 4) return false;
  id[4] = '\0';
  if (fread(size, 4, 1, f) != 1) return false;
  return true;
}

// Probe a WAV file: fills info, returns 0 on success.
int dsyn_wav_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char id[5];
  uint32_t size;
  if (!read_chunk_header(f, id, &size) || strncmp(id, "RIFF", 4) != 0) {
    fclose(f);
    return -2;
  }
  char wave[5] = {0};
  if (fread(wave, 1, 4, f) != 4 || strncmp(wave, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  int64_t data_size = -1;
  while (read_chunk_header(f, id, &size)) {
    if (strncmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) {
        fclose(f);
        return -3;
      }
      fmt = *(uint16_t*)(buf);
      channels = *(uint16_t*)(buf + 2);
      rate = *(uint32_t*)(buf + 4);
      bits = *(uint16_t*)(buf + 14);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (strncmp(id, "data", 4) == 0) {
      data_size = size;
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (data_size < 0 || channels == 0) return -3;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)channels;
  info->format = (fmt == 3 || bits == 32) ? 3 : 1;
  int bytes_per = (info->format == 3) ? 4 : 2;
  info->frames = data_size / (bytes_per * channels);
  return 0;
}

// Read samples as float32 mono (channel-averaged), normalized to [-1, 1].
// `out` must hold info.frames floats. Returns frames read or < 0 on error.
int64_t dsyn_wav_read(const char* path, float* out, int64_t max_frames) {
  WavInfo info;
  if (dsyn_wav_info(path, &info) != 0) return -1;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // Seek to the data chunk again.
  char id[5];
  uint32_t size;
  fseek(f, 12, SEEK_SET);
  while (read_chunk_header(f, id, &size)) {
    if (strncmp(id, "data", 4) == 0) break;
    fseek(f, size + (size & 1), SEEK_CUR);
  }
  int64_t frames = std::min<int64_t>(info.frames, max_frames);
  const int C = info.channels;
  if (info.format == 3) {
    std::vector<float> buf(frames * C);
    if (fread(buf.data(), 4, frames * C, f) != (size_t)(frames * C)) {
      fclose(f);
      return -2;
    }
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0;
      for (int c = 0; c < C; ++c) acc += buf[i * C + c];
      out[i] = acc / C;
    }
  } else {
    std::vector<int16_t> buf(frames * C);
    if (fread(buf.data(), 2, frames * C, f) != (size_t)(frames * C)) {
      fclose(f);
      return -2;
    }
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0;
      for (int c = 0; c < C; ++c) acc += buf[i * C + c] * scale;
      out[i] = acc / C;
    }
  }
  fclose(f);
  return frames;
}

// Write float32 mono samples as PCM16 WAV. Returns 0 on success.
int dsyn_wav_write(const char* path, const float* data, int64_t frames,
                   int32_t sample_rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_size = (uint32_t)(frames * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt = 1, channels = 1, bits = 16;
  uint32_t byte_rate = sample_rate * 2;
  uint16_t block_align = 2;
  uint32_t fmt_size = 16;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_size, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&channels, 2, 1, f);
  fwrite(&sample_rate, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_size, 4, 1, f);
  std::vector<int16_t> buf(frames);
  for (int64_t i = 0; i < frames; ++i) {
    float v = std::max(-1.0f, std::min(1.0f, data[i]));
    buf[i] = (int16_t)lrintf(v * 32767.0f);
  }
  fwrite(buf.data(), 2, frames, f);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Batch normalization helpers
// ---------------------------------------------------------------------------

// Peak-normalize each of `batch` rows of length `n` in place.
void dsyn_peak_normalize(float* data, int64_t batch, int64_t n) {
  for (int64_t b = 0; b < batch; ++b) {
    float* row = data + b * n;
    float peak = 0;
    for (int64_t i = 0; i < n; ++i) peak = std::max(peak, std::fabs(row[i]));
    if (peak > 0) {
      const float inv = 1.0f / peak;
      for (int64_t i = 0; i < n; ++i) row[i] *= inv;
    }
  }
}

// RMS-normalize each row to target_rms in place.
void dsyn_rms_normalize(float* data, int64_t batch, int64_t n,
                        float target_rms) {
  for (int64_t b = 0; b < batch; ++b) {
    float* row = data + b * n;
    double acc = 0;
    for (int64_t i = 0; i < n; ++i) acc += (double)row[i] * row[i];
    float rms = (float)std::sqrt(acc / n);
    if (rms > 0) {
      const float s = target_rms / rms;
      for (int64_t i = 0; i < n; ++i) row[i] *= s;
    }
  }
}

// ---------------------------------------------------------------------------
// Track mixdown: scatter-add notes into per-track buffers (multithreaded
// over tracks; notes within one track are serial so adds never race).
// ---------------------------------------------------------------------------

// notes: flattened note audio, note i occupying note_lengths[i] floats
//   starting at note_offsets[i].
// starts: output sample position of note i inside its track buffer.
// track_of: track index of note i.
// tracks: `n_tracks` buffers of track_lengths[t] floats (zero-initialized by
//   the caller), flattened with track_offsets.
void dsyn_mixdown(const float* notes, const int64_t* note_offsets,
                  const int64_t* note_lengths, const int64_t* starts,
                  const int32_t* track_of, int64_t n_notes, float* tracks,
                  const int64_t* track_offsets, const int64_t* track_lengths,
                  int32_t n_tracks, int32_t n_threads) {
  auto mix_track = [&](int32_t t) {
    float* buf = tracks + track_offsets[t];
    const int64_t cap = track_lengths[t];
    for (int64_t i = 0; i < n_notes; ++i) {
      if (track_of[i] != t) continue;
      const int64_t start = starts[i];
      if (start >= cap) continue;
      const int64_t len = std::min(note_lengths[i], cap - start);
      const float* src = notes + note_offsets[i];
      float* dst = buf + start;
      for (int64_t k = 0; k < len; ++k) dst[k] += src[k];
    }
  };
  if (n_threads <= 1 || n_tracks <= 1) {
    for (int32_t t = 0; t < n_tracks; ++t) mix_track(t);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int32_t> next{0};
  int32_t workers = std::min(n_threads, n_tracks);
  for (int32_t w = 0; w < workers; ++w) {
    pool.emplace_back([&]() {
      for (;;) {
        int32_t t = next.fetch_add(1);
        if (t >= n_tracks) return;
        mix_track(t);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Sum per-track buffers (varying lengths) into one output of max length.
void dsyn_sum_tracks(const float* tracks, const int64_t* track_offsets,
                     const int64_t* track_lengths, int32_t n_tracks,
                     float* out, int64_t out_len) {
  memset(out, 0, out_len * sizeof(float));
  for (int32_t t = 0; t < n_tracks; ++t) {
    const float* src = tracks + track_offsets[t];
    const int64_t len = std::min(track_lengths[t], out_len);
    for (int64_t i = 0; i < len; ++i) out[i] += src[i];
  }
}

// ---------------------------------------------------------------------------
// Prefetch ring: a bounded queue of byte buffers filled by worker threads
// running a user-supplied C callback (the Python side registers a loader
// via ctypes). Overlaps host data loading with device compute.
// ---------------------------------------------------------------------------

typedef int (*dsyn_fill_fn)(void* ctx, int64_t index, float* out,
                            int64_t capacity);

struct PrefetchRing {
  std::queue<std::vector<float>> ready;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::vector<std::thread> workers;
  std::atomic<int64_t> next_index{0};
  std::atomic<bool> stop{false};
  dsyn_fill_fn fill = nullptr;
  void* ctx = nullptr;
  int64_t item_size = 0;
  size_t capacity = 0;
};

void* dsyn_prefetch_start(dsyn_fill_fn fill, void* ctx, int64_t item_size,
                          int32_t queue_capacity, int32_t n_threads) {
  auto* ring = new PrefetchRing();
  ring->fill = fill;
  ring->ctx = ctx;
  ring->item_size = item_size;
  ring->capacity = (size_t)queue_capacity;
  for (int32_t w = 0; w < n_threads; ++w) {
    ring->workers.emplace_back([ring]() {
      while (!ring->stop.load()) {
        int64_t idx = ring->next_index.fetch_add(1);
        std::vector<float> buf(ring->item_size);
        if (ring->fill(ring->ctx, idx, buf.data(), ring->item_size) != 0) {
          return;  // loader signalled end/error
        }
        std::unique_lock<std::mutex> lk(ring->mu);
        ring->cv_push.wait(lk, [ring]() {
          return ring->ready.size() < ring->capacity || ring->stop.load();
        });
        if (ring->stop.load()) return;
        ring->ready.push(std::move(buf));
        ring->cv_pop.notify_one();
      }
    });
  }
  return ring;
}

// Pop one item (blocking). Returns 0 on success.
int dsyn_prefetch_pop(void* handle, float* out, int64_t capacity) {
  auto* ring = (PrefetchRing*)handle;
  std::unique_lock<std::mutex> lk(ring->mu);
  ring->cv_pop.wait(lk, [ring]() {
    return !ring->ready.empty() || ring->stop.load();
  });
  if (ring->ready.empty()) return -1;
  auto buf = std::move(ring->ready.front());
  ring->ready.pop();
  ring->cv_push.notify_one();
  lk.unlock();
  memcpy(out, buf.data(),
         std::min<int64_t>(capacity, (int64_t)buf.size()) * sizeof(float));
  return 0;
}

void dsyn_prefetch_stop(void* handle) {
  auto* ring = (PrefetchRing*)handle;
  ring->stop.store(true);
  ring->cv_push.notify_all();
  ring->cv_pop.notify_all();
  for (auto& th : ring->workers) th.join();
  delete ring;
}

}  // extern "C"
