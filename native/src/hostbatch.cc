// Batched host-side glue for the device pass-1 / realignment engine.
//
// The device scores whole read batches (mia_tpu/core/jax_engine.py); this
// module does everything around those dispatches that would otherwise cost
// per-read Python time:
//
//   * mia_kpa_build        — direct-address k-mer index over a reference
//                            strand (init_kpa/populate_kpa,
//                            /root/reference/src/kmer.c:90-168)
//   * mia_p1_create/free   — immutable per-assembly context (both encoded
//                            reference strands, both PSSMs, k-mer indexes)
//   * mia_p1_prepare       — per-batch k-mer filter + band intervals +
//                            device-input packing (new_kmer_filter,
//                            /root/reference/src/kmer.c:239-331, re-expressed
//                            as interval lists instead of byte masks)
//   * mia_p1_finish        — per-batch score-verified window DP + traceback
//                            for each read's winning strand (the host half of
//                            the split described in jax_engine.windowed_exact_dp)
//
// Interval semantics match mia_tpu/ops/kmer.py and jax_engine.mask_intervals
// exactly: a read whose band needs more than `max_intervals` runs on the
// host fallback (flag HOST_ONLY); a read whose band spans more than `win_w`
// columns is scored full-width on device (flag WIDE).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
void mia_dp_fill(const int8_t* s1c, int len1, const int8_t* s2c, int len2,
                 const int32_t* submat, const uint8_t* mask, int sg5,
                 const char* seq1, const char* seq2, const int32_t* hpcl,
                 const int32_t* hpcs, const int32_t* hprl, const int32_t* hprs,
                 int win_lo, int32_t* score, int32_t* trace);
int32_t mia_dp_traceback(const int32_t* trace, int len1, int len2, int aer,
                         int aec, const char* seq1, const char* seq2,
                         char* out_ref, char* out_frag, int cap, int32_t* abr,
                         int32_t* abc);
}

namespace {

constexpr int kMaxKmerPos = 128;   // MAX_KMER_POS, src/params.h:76
constexpr int kKmerSaturate = 128; // KMER_SATURATE, src/params.h:77
constexpr int kMaskBuffer = 10;    // ALIGN_MASK_BUFFER, src/params.h:78
constexpr int32_t kGep = 200;

inline int base_code(unsigned char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}

// base2inx (src/map_align.c:16-29): uppercase ACGT only, everything else 4.
inline int8_t base2inx(unsigned char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return 4;
  }
}

struct Kpa {
  int k = 0;
  std::vector<int64_t> uniq;      // sorted distinct codes
  std::vector<int32_t> starts;    // CSR offsets into positions
  std::vector<int32_t> counts;
  std::vector<int32_t> positions; // ascending within each k-mer

  // positions of `code`, or nullptr
  const int32_t* lookup(int64_t code, int32_t* count) const {
    auto it = std::lower_bound(uniq.begin(), uniq.end(), code);
    if (it == uniq.end() || *it != code) {
      *count = 0;
      return nullptr;
    }
    size_t i = it - uniq.begin();
    *count = counts[i];
    return positions.data() + starts[i];
  }
};

// rolling 2-bit codes over `seq`; invalid (non-ACGT or soft-masked) windows
// are skipped via the emit callback contract (valid flag)
template <typename Emit>
void scan_kmers(const char* seq, int64_t len, int k, bool soft_mask,
                Emit emit) {
  if (len < k) return;
  const int64_t mask = (int64_t(1) << (2 * k)) - 1;
  int64_t code = 0;
  int run = 0;      // count of consecutive valid chars ending here
  int lower_run = 0; // consecutive chars w/o lowercase (for soft-mask skip)
  for (int64_t i = 0; i < len; ++i) {
    int c = base_code((unsigned char)seq[i]);
    if (c < 0) {
      run = 0;
      code = 0;
    } else {
      code = ((code << 2) | c) & mask;
      ++run;
    }
    bool lower = seq[i] >= 'a' && seq[i] <= 'z';
    lower_run = lower ? 0 : lower_run + 1;
    if (run >= k && (!soft_mask || lower_run >= k)) emit(i - k + 1, code);
  }
}

struct Ctx {
  int64_t len1 = 0;
  std::vector<int8_t> fw_c, rc_c;      // encoded strands
  std::vector<char> fw_s, rc_s;        // raw chars (traceback emission)
  std::vector<int32_t> submat[2];      // [31*5*5] each; 1 may be empty
  int32_t max_sub[2] = {0, 0};
  Kpa* fkpa = nullptr;                 // not owned
  Kpa* rkpa = nullptr;
  int kmer_len = 0;                    // <0 => no filtering (full-open)
  int win_w = 384;
  int max_iv = 16;
};

struct IvBuf {
  std::vector<std::pair<int32_t, int32_t>> iv; // [lo, end) exclusive
};

// union of hit bands as sorted merged intervals; returns total hit count
int accumulate_bands(const Kpa& kpa, const char* seq, int frag_len, int k,
                     int64_t len1, bool rc_strand, IvBuf& out) {
  out.iv.clear();
  int total = 0;
  std::vector<std::pair<int32_t, int32_t>>& iv = out.iv;
  scan_kmers(seq, frag_len, k, false, [&](int64_t fp, int64_t code) {
    int32_t cnt = 0;
    const int32_t* pos = kpa.lookup(code, &cnt);
    total += cnt;
    for (int32_t j = 0; j < cnt; ++j) {
      int64_t rp = pos[j];
      int64_t lo = rp - fp - kMaskBuffer;
      // quirk preserved from new_kmer_filter (mia_tpu/ops/kmer.py:176,184):
      // the fw band extends one column further right than the rc band
      int64_t hi = rc_strand ? rp + frag_len - fp - 1 + kMaskBuffer
                             : rp + (frag_len - fp) + kMaskBuffer;
      lo = std::max<int64_t>(lo, 0);
      hi = std::min<int64_t>(hi, len1 - 1);
      if (hi >= lo) iv.emplace_back((int32_t)lo, (int32_t)(hi + 1));
    }
  });
  if (total >= kKmerSaturate) {
    iv.clear();
    iv.emplace_back(0, (int32_t)len1);
    return total;
  }
  if (iv.empty()) return total;
  std::sort(iv.begin(), iv.end());
  size_t w = 0;
  for (size_t i = 1; i < iv.size(); ++i) {
    if (iv[i].first <= iv[w].second) {
      iv[w].second = std::max(iv[w].second, iv[i].second);
    } else {
      iv[++w] = iv[i];
    }
  }
  iv.resize(w + 1);
  return total;
}

}  // namespace

extern "C" {

void* mia_kpa_build(const char* seq, int64_t len, int k, int soft_mask) {
  auto* kpa = new Kpa();
  kpa->k = k;
  std::vector<std::pair<int64_t, int32_t>> entries; // (code, pos)
  entries.reserve(len);
  scan_kmers(seq, len, k, soft_mask != 0,
             [&](int64_t pos, int64_t code) { entries.emplace_back(code, (int32_t)pos); });
  std::stable_sort(entries.begin(), entries.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  // cap at the first kMaxKmerPos positions per k-mer (src/kmer.c:75-77)
  for (size_t i = 0; i < entries.size();) {
    size_t j = i;
    while (j < entries.size() && entries[j].first == entries[i].first) ++j;
    size_t keep = std::min<size_t>(j - i, kMaxKmerPos);
    kpa->uniq.push_back(entries[i].first);
    kpa->starts.push_back((int32_t)kpa->positions.size());
    kpa->counts.push_back((int32_t)keep);
    for (size_t t = i; t < i + keep; ++t) kpa->positions.push_back(entries[t].second);
    i = j;
  }
  return kpa;
}

void mia_kpa_free(void* h) { delete static_cast<Kpa*>(h); }

void* mia_p1_create(const char* fw_seq, const char* rc_seq, int64_t len1,
                    const int32_t* submat_a, const int32_t* submat_b,
                    void* fkpa, void* rkpa, int kmer_len, int win_w,
                    int max_intervals) {
  auto* ctx = new Ctx();
  ctx->len1 = len1;
  ctx->fw_s.assign(fw_seq, fw_seq + len1);
  ctx->rc_s.assign(rc_seq, rc_seq + len1);
  ctx->fw_c.resize(len1);
  ctx->rc_c.resize(len1);
  for (int64_t i = 0; i < len1; ++i) {
    ctx->fw_c[i] = base2inx((unsigned char)fw_seq[i]);
    ctx->rc_c[i] = base2inx((unsigned char)rc_seq[i]);
  }
  for (int s = 0; s < 2; ++s) {
    const int32_t* m = s == 0 ? submat_a : submat_b;
    if (!m) continue;
    ctx->submat[s].assign(m, m + 31 * 5 * 5);
    ctx->max_sub[s] = *std::max_element(ctx->submat[s].begin(), ctx->submat[s].end());
  }
  ctx->fkpa = static_cast<Kpa*>(fkpa);
  ctx->rkpa = static_cast<Kpa*>(rkpa);
  ctx->kmer_len = kmer_len;
  ctx->win_w = win_w;
  ctx->max_iv = max_intervals;
  return ctx;
}

void mia_p1_free(void* h) { delete static_cast<Ctx*>(h); }

// flags bits
enum { kSkip = 1, kHostOnly = 2, kWide = 4 };

// Pack one batch for the device scorer.  Outputs (caller-allocated):
//   s2c      [n, L] int32 codes (pad 4)
//   fw_ws/rc_ws [n] int32 window starts (0 when wide/unused)
//   fw_ivg/rc_ivg [n, K, 2] int32 GLOBAL-coordinate intervals (end-exclusive)
//   flags    [n] int32 (kSkip / kHostOnly / kWide)
// A strand with no hits gets zero intervals (device returns HIM).
void mia_p1_prepare(void* h, int n, const char* arena, const int64_t* off,
                    const int32_t* lens, int L, int32_t* s2c, int32_t* fw_ws,
                    int32_t* rc_ws, int32_t* fw_ivg, int32_t* rc_ivg,
                    int32_t* flags) {
  Ctx* ctx = static_cast<Ctx*>(h);
  const int K = ctx->max_iv;
  const int64_t len1 = ctx->len1;
  IvBuf fb, rb;
  for (int b = 0; b < n; ++b) {
    const char* seq = arena + off[b];
    const int frag_len = lens[b];
    int32_t* fi = fw_ivg + (int64_t)b * K * 2;
    int32_t* ri = rc_ivg + (int64_t)b * K * 2;
    std::memset(fi, 0, sizeof(int32_t) * K * 2);
    std::memset(ri, 0, sizeof(int32_t) * K * 2);
    fw_ws[b] = rc_ws[b] = 0;
    int32_t* row = s2c + (int64_t)b * L;
    for (int i = 0; i < L; ++i)
      row[i] = i < frag_len ? base2inx((unsigned char)seq[i]) : 4;

    if (ctx->kmer_len < 0) {
      // no filtering: full-open both strands => wide path
      fi[0] = 0; fi[1] = (int32_t)len1;
      ri[0] = 0; ri[1] = (int32_t)len1;
      flags[b] = kWide;
      continue;
    }
    int num_f = 0, num_r = 0;
    fb.iv.clear(); rb.iv.clear();
    if (frag_len >= ctx->kmer_len) {
      if (ctx->fkpa)
        num_f = accumulate_bands(*ctx->fkpa, seq, frag_len, ctx->kmer_len,
                                 len1, false, fb);
      if (ctx->rkpa)
        num_r = accumulate_bands(*ctx->rkpa, seq, frag_len, ctx->kmer_len,
                                 len1, true, rb);
    }
    if (num_f + num_r == 0) {
      flags[b] = kSkip;
      continue;
    }
    if ((int)fb.iv.size() > K || (int)rb.iv.size() > K) {
      flags[b] = kHostOnly;
      continue;
    }
    bool wide = false;
    for (int s = 0; s < 2 && !wide; ++s) {
      const auto& iv = s == 0 ? fb.iv : rb.iv;
      if (iv.empty()) continue;
      int32_t lo = iv.front().first;
      int32_t hi = iv.back().second;
      int32_t ws = std::max(lo - 2, 0);
      if (hi - ws > ctx->win_w) wide = true;
    }
    for (int s = 0; s < 2; ++s) {
      const auto& iv = s == 0 ? fb.iv : rb.iv;
      int32_t* gi = s == 0 ? fi : ri;
      for (size_t t = 0; t < iv.size(); ++t) {
        gi[2 * t] = iv[t].first;
        gi[2 * t + 1] = iv[t].second;
      }
      if (!wide && !iv.empty()) {
        int32_t ws = std::max(iv.front().first - 2, 0);
        (s == 0 ? fw_ws : rc_ws)[b] = ws;
      }
    }
    flags[b] = wide ? kWide : 0;
  }
}

// Score-verified window DP + traceback for each read's winning strand.
// Mirrors jax_engine.windowed_exact_dp: solve over mask AND [lo, aec]; accept
// iff (best, aec) reproduce and the alignment start clears the window edge;
// else re-solve over the full k-mer-banded width.
// out_meta[b] = {best, abc, aec, pwlen}; strings at out_ref/out_frag + b*cap.
void mia_p1_finish(void* h, int n, const char* arena, const int64_t* off,
                   const int32_t* lens, const uint8_t* strand,
                   const uint8_t* smidx, const int32_t* dev_best,
                   const int32_t* dev_aec, const int32_t* ivg,
                   int K, int32_t* out_meta, char* out_ref, char* out_frag,
                   int64_t cap) {
  Ctx* ctx = static_cast<Ctx*>(h);
  const int64_t len1 = ctx->len1;
  std::vector<uint8_t> mask;
  std::vector<int8_t> s2c;
  std::vector<int32_t> score, trace;

  for (int b = 0; b < n; ++b) {
    const char* seq2 = arena + off[b];
    const int len2 = lens[b];
    const int8_t* s1c = strand[b] ? ctx->rc_c.data() : ctx->fw_c.data();
    const char* seq1 = strand[b] ? ctx->rc_s.data() : ctx->fw_s.data();
    const int32_t* sm = ctx->submat[smidx[b]].data();
    const int32_t msub = ctx->max_sub[smidx[b]];
    const int32_t* iv = ivg + (int64_t)b * K * 2;
    int32_t* meta = out_meta + (int64_t)b * 4;

    s2c.resize(len2);
    for (int i = 0; i < len2; ++i) s2c[i] = base2inx((unsigned char)seq2[i]);

    const int32_t best = dev_best[b];
    const int32_t aec = dev_aec[b];
    int64_t slack = 0;
    if ((int64_t)best < (int64_t)len2 * msub)
      slack = ((int64_t)len2 * msub - best) / kGep;
    const int64_t margin = (int64_t)len2 + slack + 16;
    const int32_t lo = (int32_t)std::max<int64_t>((int64_t)aec - margin, 0);

    // iterate: attempt 0 = verification window [lo, aec]; attempt 1 = full
    for (int attempt = 0; attempt < 2; ++attempt) {
      const bool windowed = attempt == 0 && (lo > 0 || aec < len1 - 1);
      if (attempt == 0 && !windowed) continue;  // degenerate: go straight to full
      // effective open-column range under (intervals AND [clip_lo, clip_hi])
      int32_t clip_lo = windowed ? lo : 0;
      int32_t clip_hi = windowed ? aec + 1 : (int32_t)len1;  // end-exclusive
      int32_t first_open = -1, last_open = -1;
      for (int t = 0; t < K; ++t) {
        int32_t a = std::max(iv[2 * t], clip_lo);
        int32_t e = std::min(iv[2 * t + 1], clip_hi);
        if (iv[2 * t + 1] <= 0) continue;  // unused slot
        if (a < e) {
          if (first_open < 0) first_open = a;
          last_open = e - 1;
        }
      }
      if (first_open < 0) {
        if (attempt == 0) continue;  // nothing open in window: full pass
        meta[0] = INT32_MIN / 2;     // fully masked (shouldn't happen for winners)
        meta[1] = meta[2] = meta[3] = 0;
        break;
      }
      const int32_t win_lo = std::max(first_open - 2, 0);
      const int32_t w = last_open - win_lo + 1;
      mask.assign(w, 0);
      for (int t = 0; t < K; ++t) {
        if (iv[2 * t + 1] <= 0) continue;
        int32_t a = std::max(std::max(iv[2 * t], clip_lo), win_lo);
        int32_t e = std::min(std::min(iv[2 * t + 1], clip_hi), win_lo + w);
        for (int32_t c = a; c < e; ++c) mask[c - win_lo] = 1;
      }
      score.resize((size_t)w * len2);
      trace.resize((size_t)w * len2);
      mia_dp_fill(s1c + win_lo, w, s2c.data(), len2, sm, mask.data(),
                  /*sg5=*/1, seq1 + win_lo, seq2, nullptr, nullptr, nullptr,
                  nullptr, win_lo, score.data(), trace.data());
      const int32_t* last = score.data() + (size_t)(len2 - 1) * w;
      int32_t aecl = 0;
      int32_t bs = last[0];
      for (int c = 1; c < w; ++c)
        if (last[c] > bs) { bs = last[c]; aecl = c; }
      int32_t abr, abc;
      int32_t pwlen = mia_dp_traceback(
          trace.data(), w, len2, len2 - 1, aecl, seq1 + win_lo, seq2,
          out_ref + (int64_t)b * cap, out_frag + (int64_t)b * cap, (int)cap,
          &abr, &abc);
      const int32_t aecg = aecl + win_lo;
      const int32_t abcg = abc + win_lo;
      if (windowed) {
        if (!(bs == best && aecg == aec && (lo == 0 || abcg > lo + 2)))
          continue;  // verification failed: fall back to the full width
      }
      meta[0] = bs;
      meta[1] = abcg;
      meta[2] = aecg;
      meta[3] = pwlen;
      break;
    }
  }
}

}  // extern "C"
