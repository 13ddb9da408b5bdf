// Native runtime core for tpu-audio (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's host-side native surface
// (SURVEY.md §2B): the AVAudioConverter resampler
// (package/Audio/AudioResampler.swift), the swift-tiktoken CoreBPE
// (package/STT/Whisper/WhisperTokenizer.swift), the CPU DTW of word timing
// (package/STT/Whisper/WhisperTiming.swift:46), and the AVAudioEngine
// streaming ring buffer (package/Audio/AudioSamplePlayer.swift).
//
// Everything here is host-side glue around the TPU hot path: audio enters
// through the resampler, tokens through the BPE, and synthesized samples
// leave through the lock-free ring buffer.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" {

// ------------------------------------------------------------------ resample

// Kaiser-windowed sinc polyphase resampler; identical filter design to
// tpu_audio/ops/resample.py (taps_per_zero=10, beta=5.0, gain=up).
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-21 * sum) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) { return b ? gcd64(b, a % b) : a; }

// Returns number of output samples written (<= out_capacity).
int64_t ta_resample(const float* in, int64_t n_in, int32_t sr_in,
                    int32_t sr_out, float* out, int64_t out_capacity) {
  if (sr_in == sr_out) {
    int64_t n = std::min(n_in, out_capacity);
    std::memcpy(out, in, n * sizeof(float));
    return n;
  }
  int64_t g = gcd64(sr_in, sr_out);
  int64_t up = sr_out / g, down = sr_in / g;
  int64_t max_rate = std::max(up, down);
  int64_t half_len = 10 * max_rate;
  int64_t flen = 2 * half_len + 1;

  // filter design (double precision, matches numpy reference)
  std::vector<double> h(flen);
  double cutoff = 1.0 / (double)max_rate;
  double beta = 5.0, denom = bessel_i0(beta);
  for (int64_t i = 0; i < flen; ++i) {
    double n = (double)(i - half_len);
    double s = (n == 0.0) ? cutoff
                          : cutoff * std::sin(M_PI * cutoff * n) / (M_PI * cutoff * n);
    double r = 2.0 * (double)i / (double)(flen - 1) - 1.0;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[i] = s * w * (double)up;
  }

  int64_t n_out = (n_in * up + down - 1) / down;
  n_out = std::min(n_out, out_capacity);
  // polyphase: y[n] at upsampled position p = n*down + half_len
  int64_t n_taps = (flen + up - 1) / up;
  for (int64_t n = 0; n < n_out; ++n) {
    int64_t p = n * down + half_len;
    int64_t phase = p % up;
    int64_t base = p / up;
    double acc = 0.0;
    for (int64_t t = 0; t < n_taps; ++t) {
      int64_t hi = t * up + phase;
      if (hi >= flen) break;
      int64_t xi = base - t;
      if (xi >= 0 && xi < n_in) acc += h[hi] * (double)in[xi];
    }
    out[n] = (float)acc;
  }
  return n_out;
}

// ------------------------------------------------------------------ BPE

// tiktoken-semantics byte-pair encoder over a rank table. The regex
// pre-split stays in Python (unicode classes); this core does the O(n²)
// merge loop which dominates encode time.
struct BpeTable {
  std::map<std::string, int32_t> ranks;
};

void* ta_bpe_new() { return new BpeTable(); }

void ta_bpe_add(void* h, const uint8_t* token, int32_t len, int32_t rank) {
  auto* t = static_cast<BpeTable*>(h);
  t->ranks[std::string(reinterpret_cast<const char*>(token), len)] = rank;
}

void ta_bpe_free(void* h) { delete static_cast<BpeTable*>(h); }

// Encode one pre-split piece; returns count written to out (<= capacity).
int32_t ta_bpe_encode_piece(void* h, const uint8_t* piece, int32_t len,
                            int32_t* out, int32_t capacity) {
  auto* t = static_cast<BpeTable*>(h);
  std::string s(reinterpret_cast<const char*>(piece), len);
  auto whole = t->ranks.find(s);
  if (whole != t->ranks.end()) {
    if (capacity > 0) out[0] = whole->second;
    return 1;
  }
  // start from single bytes
  std::vector<std::string> parts(len);
  for (int32_t i = 0; i < len; ++i) parts[i] = s.substr(i, 1);
  while (parts.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best_i = SIZE_MAX;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = t->ranks.find(parts[i] + parts[i + 1]);
      if (it != t->ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_i == SIZE_MAX) break;
    parts[best_i] = parts[best_i] + parts[best_i + 1];
    parts.erase(parts.begin() + best_i + 1);
  }
  int32_t n = 0;
  for (auto& p : parts) {
    auto it = t->ranks.find(p);
    if (it != t->ranks.end()) {
      if (n < capacity) out[n] = it->second;
      ++n;
    } else {
      for (char c : p) {
        auto ib = t->ranks.find(std::string(1, c));
        if (ib != t->ranks.end()) {
          if (n < capacity) out[n] = ib->second;
          ++n;
        }
      }
    }
  }
  return n;
}

// ------------------------------------------------------------------ DTW

// Monotonic DTW traceback over an (n x m) cost matrix (row-major float).
// Writes up to n+m (i,j) pairs; returns path length. Mirrors
// tpu_audio/models/whisper/timing.py::dtw.
int64_t ta_dtw(const float* x, int64_t n, int64_t m,
               int32_t* out_ti, int32_t* out_tj) {
  const double INF = 1e300;
  std::vector<double> prev(m + 1, INF), cur(m + 1, INF);
  std::vector<int8_t> trace((n + 1) * (m + 1), 0);
  prev[0] = 0.0;
  for (int64_t i = 1; i <= n; ++i) {
    cur.assign(m + 1, INF);
    for (int64_t j = 1; j <= m; ++j) {
      double c0 = prev[j - 1], c1 = prev[j], c2 = cur[j - 1];
      double v = x[(i - 1) * m + (j - 1)];
      int8_t tr;
      double base;
      if (c0 <= c1 && c0 <= c2) { base = c0; tr = 0; }
      else if (c1 <= c2) { base = c1; tr = 1; }
      else { base = c2; tr = 2; }
      cur[j] = base + v;
      trace[i * (m + 1) + j] = tr;
    }
    std::swap(prev, cur);
  }
  int64_t i = n, j = m, k = 0;
  std::vector<int32_t> ti, tj;
  while (i > 0 && j > 0) {
    ti.push_back((int32_t)(i - 1));
    tj.push_back((int32_t)(j - 1));
    switch (trace[i * (m + 1) + j]) {
      case 0: --i; --j; break;
      case 1: --i; break;
      default: --j; break;
    }
  }
  for (int64_t p = (int64_t)ti.size() - 1; p >= 0; --p, ++k) {
    out_ti[k] = ti[p];
    out_tj[k] = tj[p];
  }
  return k;
}

// ------------------------------------------------------------------ ring buffer

// Lock-free SPSC float ring buffer: the producer is the synthesis thread
// draining TPU chunks, the consumer is an audio callback / file sink.
struct Ring {
  std::vector<float> buf;
  std::atomic<uint64_t> head{0};  // written
  std::atomic<uint64_t> tail{0};  // read
};

void* ta_ring_new(int64_t capacity) {
  auto* r = new Ring();
  r->buf.resize((size_t)capacity);
  return r;
}

void ta_ring_free(void* h) { delete static_cast<Ring*>(h); }

int64_t ta_ring_write(void* h, const float* data, int64_t n) {
  auto* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  int64_t cap = (int64_t)r->buf.size();
  int64_t free_space = cap - (int64_t)(head - tail);
  int64_t todo = std::min(n, free_space);
  for (int64_t i = 0; i < todo; ++i)
    r->buf[(size_t)((head + i) % cap)] = data[i];
  r->head.store(head + todo, std::memory_order_release);
  return todo;
}

int64_t ta_ring_read(void* h, float* out, int64_t n) {
  auto* r = static_cast<Ring*>(h);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  int64_t avail = (int64_t)(head - tail);
  int64_t todo = std::min(n, avail);
  int64_t cap = (int64_t)r->buf.size();
  for (int64_t i = 0; i < todo; ++i)
    out[i] = r->buf[(size_t)((tail + i) % cap)];
  r->tail.store(tail + todo, std::memory_order_release);
  return todo;
}

int64_t ta_ring_available(void* h) {
  auto* r = static_cast<Ring*>(h);
  return (int64_t)(r->head.load(std::memory_order_acquire) -
                   r->tail.load(std::memory_order_acquire));
}

}  // extern "C"
