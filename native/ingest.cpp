// Native host-side IQ ingest runtime for rub_mimo_tpu.
//
// TPU-native successor of the reference's C++ I/O runtime: UHD's wire/CPU
// format conversion ("sc16" wire, "fc32" cpu — mimo/config.h:51-52), the
// rx_worker capture loop that fwrites raw IQ to disk (mimo/main.cc:872-898)
// and the pthread tx/rx pipeline (main.cc:1373-1386).  Here the radio is a
// file: this library provides
//
//   - vectorized sc16 <-> fc32 IQ conversion (the UHD wire format, so
//     int16 captures replay and new captures can be written compactly)
//   - interleaved <-> planar multichannel deinterleaving
//   - capture validation scans (NaN/Inf, peak magnitude)
//   - a double-buffered background-prefetch block reader (single-writer
//     thread + mutex/condvar, the disciplined version of the reference's
//     rx thread handshake) so host IO overlaps device compute
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (rub_mimo_tpu/io/native.py), with a numpy fallback when unbuilt.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// format conversion
// ---------------------------------------------------------------------

// Interleaved sc16 IQ -> float32 IQ pairs.  scale maps int16 full scale to
// the desired float amplitude (UHD uses 1/32767).
void rmt_sc16_to_fc32(const int16_t* in, float* out, int64_t n_iq,
                      float scale) {
  const int64_t n = n_iq * 2;
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(in[i]) * scale;
}

// float32 IQ pairs -> interleaved sc16 with clamping.
void rmt_fc32_to_sc16(const float* in, int16_t* out, int64_t n_iq,
                      float scale) {
  const int64_t n = n_iq * 2;
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * scale;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(lrintf(v));
  }
}

// Interleaved multichannel fc32 IQ -> planar [chan][samp] buffers.
void rmt_deinterleave_fc32(const float* in, float** outs, int32_t n_chan,
                           int64_t n_samp) {
  for (int64_t s = 0; s < n_samp; ++s) {
    const float* src = in + 2 * n_chan * s;
    for (int32_t c = 0; c < n_chan; ++c) {
      outs[c][2 * s] = src[2 * c];
      outs[c][2 * s + 1] = src[2 * c + 1];
    }
  }
}

// Planar -> interleaved.
void rmt_interleave_fc32(const float** ins, float* out, int32_t n_chan,
                         int64_t n_samp) {
  for (int64_t s = 0; s < n_samp; ++s) {
    float* dst = out + 2 * n_chan * s;
    for (int32_t c = 0; c < n_chan; ++c) {
      dst[2 * c] = ins[c][2 * s];
      dst[2 * c + 1] = ins[c][2 * s + 1];
    }
  }
}

// ---------------------------------------------------------------------
// validation scans (ingest-layer failure detection; SURVEY §5)
// ---------------------------------------------------------------------

// Returns: 0 ok; 1 non-finite found.  Writes max |re|,|im| to *peak.
int32_t rmt_validate_fc32(const float* in, int64_t n_floats, float* peak) {
  float p = 0.0f;
  int32_t bad = 0;
  for (int64_t i = 0; i < n_floats; ++i) {
    const float v = in[i];
    if (!std::isfinite(v)) bad = 1;
    const float a = std::fabs(v);
    if (a > p) p = a;
  }
  *peak = p;
  return bad;
}

// ---------------------------------------------------------------------
// background-prefetch block reader
// ---------------------------------------------------------------------

struct RmtReader {
  FILE* f = nullptr;
  int64_t block_bytes = 0;
  int n_buffers = 0;
  std::vector<std::vector<uint8_t>> bufs;
  std::vector<int64_t> filled;  // bytes valid in each slot; -1 = empty
  int64_t head = 0;             // next slot to hand out
  int64_t tail = 0;             // next slot to fill
  bool eof = false;
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv_can_fill, cv_can_read;
  std::thread worker;

  void run() {
    for (;;) {
      std::unique_lock<std::mutex> lk(mu);
      cv_can_fill.wait(lk, [&] {
        return stop.load() || (tail - head) < n_buffers;
      });
      if (stop.load()) return;
      const int slot = static_cast<int>(tail % n_buffers);
      lk.unlock();
      const size_t got = fread(bufs[slot].data(), 1,
                               static_cast<size_t>(block_bytes), f);
      lk.lock();
      filled[slot] = static_cast<int64_t>(got);
      ++tail;
      if (got < static_cast<size_t>(block_bytes)) {
        eof = true;
        cv_can_read.notify_all();
        return;
      }
      cv_can_read.notify_all();
    }
  }
};

// Open a capture for background-prefetched block reads.
void* rmt_reader_open(const char* path, int64_t block_bytes,
                      int32_t n_buffers) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new RmtReader();
  r->f = f;
  r->block_bytes = block_bytes;
  r->n_buffers = n_buffers;
  r->bufs.resize(n_buffers);
  for (auto& b : r->bufs) b.resize(static_cast<size_t>(block_bytes));
  r->filled.assign(n_buffers, -1);
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// Blocking: copy the next block into out; returns bytes copied (0 at EOF).
int64_t rmt_reader_next(void* handle, uint8_t* out) {
  auto* r = static_cast<RmtReader*>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_can_read.wait(lk, [&] { return r->head < r->tail || r->eof; });
  if (r->head >= r->tail) return 0;  // EOF drained
  const int slot = static_cast<int>(r->head % r->n_buffers);
  const int64_t got = r->filled[slot];
  memcpy(out, r->bufs[slot].data(), static_cast<size_t>(got));
  r->filled[slot] = -1;
  ++r->head;
  r->cv_can_fill.notify_one();
  return got;
}

void rmt_reader_close(void* handle) {
  auto* r = static_cast<RmtReader*>(handle);
  r->stop.store(true);
  r->cv_can_fill.notify_all();
  if (r->worker.joinable()) r->worker.join();
  fclose(r->f);
  delete r;
}

}  // extern "C"
