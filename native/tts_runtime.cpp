// tts_runtime — native host-side streaming runtime for tts_inference_tpu.
//
// The reference keeps its per-token host loop in Python
// (modal_audio_stream.py:307-336 token gate; :132-202 de-interleave); its
// native speed lives in third-party engines. Here the host hot path — the
// part that runs once per generated token per stream, at 100+ TPS × 64
// streams — is first-party C++ behind a C ABI (ctypes-loaded; the Python
// implementation in tts_inference_tpu/protocol.py is the reference
// semantics and the fallback, and tests assert equivalence).
//
// Components:
//   * TokenExtractor    — SOS/EOS gate with first-/last-SOS strategies
//   * deinterleave      — 7-token frames → 3 SNAC layers, offsets + clamp
//   * emission_window   — windowed lookahead emission bookkeeping
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t kTokenSOS = 128257;
constexpr int32_t kTokenEOS = 128258;
constexpr int32_t kAudioBase = 128266;
constexpr int32_t kFrameSize = 7;
constexpr int32_t kCodebook = 4096;
constexpr int32_t kAudioVocab = kFrameSize * kCodebook;

struct Extractor {
  bool restart_on_sos = false;
  bool started = false;
  bool finished = false;
  int64_t restarts = 0;
  std::vector<int32_t> codes;
};

}  // namespace

extern "C" {

// ---------- extractor ------------------------------------------------------

void* ex_create(int restart_on_sos, int started) {
  auto* e = new Extractor();
  e->restart_on_sos = restart_on_sos != 0;
  e->started = started != 0;
  return e;
}

void ex_destroy(void* h) { delete static_cast<Extractor*>(h); }

int ex_started(void* h) { return static_cast<Extractor*>(h)->started ? 1 : 0; }
int ex_finished(void* h) { return static_cast<Extractor*>(h)->finished ? 1 : 0; }
int64_t ex_total_codes(void* h) {
  return static_cast<int64_t>(static_cast<Extractor*>(h)->codes.size());
}
int64_t ex_restarts(void* h) { return static_cast<Extractor*>(h)->restarts; }

// Feed `n` token ids; newly accepted codes are appended to the internal
// buffer and also copied to `out` (capacity `out_cap`). Returns the number
// of new codes (may exceed out_cap; only out_cap are copied).
int64_t ex_feed(void* h, const int32_t* tokens, int64_t n, int32_t* out,
                int64_t out_cap) {
  auto* e = static_cast<Extractor*>(h);
  int64_t emitted = 0;
  for (int64_t i = 0; i < n && !e->finished; ++i) {
    const int32_t t = tokens[i];
    if (t == kTokenEOS) {
      e->finished = true;
      break;
    }
    if (t == kTokenSOS) {
      if (e->started && e->restart_on_sos) {
        e->codes.clear();
        ++e->restarts;
      }
      e->started = true;
      continue;
    }
    if (!e->started || t < kAudioBase) continue;
    const int32_t code = t - kAudioBase;
    if (code >= kAudioVocab) continue;
    e->codes.push_back(code);
    if (out != nullptr && emitted < out_cap) out[emitted] = code;
    ++emitted;
  }
  return emitted;
}

// Copy the internal code buffer range [lo, hi) into out.
void ex_codes(void* h, int64_t lo, int64_t hi, int32_t* out) {
  auto* e = static_cast<Extractor*>(h);
  if (lo < 0) lo = 0;
  if (hi > static_cast<int64_t>(e->codes.size()))
    hi = static_cast<int64_t>(e->codes.size());
  for (int64_t i = lo; i < hi; ++i) out[i - lo] = e->codes[i];
}

// ---------- frame de-interleave ---------------------------------------------

// codes: n_frames*7 flat interleaved codes (offsets applied).
// l1: n, l2: 2n, l3: 4n int32 outputs, clamped to [0, 4095].
void deinterleave(const int32_t* codes, int64_t n_frames, int32_t* l1,
                  int32_t* l2, int32_t* l3) {
  auto clampc = [](int32_t v) {
    return v < 0 ? 0 : (v >= kCodebook ? kCodebook - 1 : v);
  };
  for (int64_t f = 0; f < n_frames; ++f) {
    const int32_t* c = codes + f * kFrameSize;
    l1[f] = clampc(c[0]);
    l2[2 * f + 0] = clampc(c[1] - 1 * kCodebook);
    l2[2 * f + 1] = clampc(c[4] - 4 * kCodebook);
    l3[4 * f + 0] = clampc(c[2] - 2 * kCodebook);
    l3[4 * f + 1] = clampc(c[3] - 3 * kCodebook);
    l3[4 * f + 2] = clampc(c[5] - 5 * kCodebook);
    l3[4 * f + 3] = clampc(c[6] - 6 * kCodebook);
  }
}

// ---------- lookahead emission bookkeeping ----------------------------------

// Given the decoder state, compute the next decode window and emission span.
// Inputs: samples_emitted, total_frames, samples_per_frame, lookahead,
//         left_context, frames_per_chunk, flush (1 = EOS flush).
// Outputs (out[4]): w0_frame, w1_frame, emit_lo_sample, emit_hi_sample —
// relative: emit samples [emit_lo, emit_hi) of the decode of frames
// [w0, w1). Returns 1 if there is something to emit, 0 otherwise.
int emission_window(int64_t samples_emitted, int64_t total_frames,
                    int64_t samples_per_frame, int64_t lookahead,
                    int64_t left_context, int64_t frames_per_chunk,
                    int flush, int64_t* out) {
  const int64_t stable_frames =
      flush ? total_frames : total_frames - lookahead;
  const int64_t stable_end = stable_frames * samples_per_frame;
  if (stable_end <= samples_emitted) return 0;
  const int64_t emit_frame = samples_emitted / samples_per_frame;
  if (!flush) {
    const int64_t pending = stable_frames - emit_frame;
    if (pending < frames_per_chunk) return 0;
  }
  int64_t w0 = emit_frame - left_context;
  if (w0 < 0) w0 = 0;
  out[0] = w0;
  out[1] = total_frames;
  out[2] = samples_emitted - w0 * samples_per_frame;
  out[3] = stable_end - w0 * samples_per_frame;
  return 1;
}

}  // extern "C"
