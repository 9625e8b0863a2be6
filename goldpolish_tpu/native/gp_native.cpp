// gp_native — native host kernels for goldpolish_tpu.
//
// The reference keeps its data-plane hot loops native (SeqIndex scan:
// src/seqindex.cpp; Bloom fill: src/utils.cpp:96-123 with btllib ntHash);
// this library provides the TPU framework's equivalents, exposed through a
// plain C ABI consumed via ctypes (no pybind11 in the build environment).
//
// Everything here is a from-scratch implementation:
//  * ntHash v1 recurrences re-derived from the published scheme
//    (reference: subprojects/ntedit/lib/nthash.hpp) — same constants, our
//    own code,
//  * conservative-update 8-bit counting Bloom + plain Bloom fill with the
//    reference's per-k escalating threshold,
//  * FASTA/FASTQ linear-scan indexer with byte offsets + mean phred
//    (2-line FASTA / 4-line FASTQ framing, like the reference indexer).
//
// Build: see build.py (g++ -O3 -shared -fPIC -fopenmp).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr uint64_t SEED_A = 0x3c8bfbb395c60474ULL;
constexpr uint64_t SEED_C = 0x3193c18562a02b4cULL;
constexpr uint64_t SEED_G = 0x20323ed082572324ULL;
constexpr uint64_t SEED_T = 0x295549f54be24456ULL;
constexpr uint64_t MULTI_SEED = 0x90b45d39fb6da1faULL;
constexpr int MULTI_SHIFT = 27;
constexpr uint64_t M33 = 0x1FFFFFFFFULL;
constexpr uint64_t M31 = 0x7FFFFFFFULL;

struct SeedTabs {
  uint64_t fwd[256];
  uint64_t rc[256];
  SeedTabs() {
    std::memset(fwd, 0, sizeof(fwd));
    fwd[1] = SEED_T;
    fwd[3] = SEED_G;
    fwd[4] = SEED_A;
    fwd[7] = SEED_C;
    fwd['A'] = fwd['a'] = SEED_A;
    fwd['C'] = fwd['c'] = SEED_C;
    fwd['G'] = fwd['g'] = SEED_G;
    fwd['T'] = fwd['t'] = SEED_T;
    for (int c = 0; c < 256; c++) rc[c] = fwd[c & 0x07];
  }
};
const SeedTabs kSeeds;

// split-rotate left by 1: independent rotations of the 31-bit high field
// and the 33-bit low field.
inline uint64_t srol(uint64_t v) {
  uint64_t hi = v >> 33, lo = v & M33;
  hi = ((hi << 1) | (hi >> 30)) & M31;
  lo = ((lo << 1) | (lo >> 32)) & M33;
  return (hi << 33) | lo;
}

inline uint64_t srol_n(uint64_t v, unsigned n) {
  unsigned s31 = n % 31, s33 = n % 33;
  uint64_t hi = v >> 33, lo = v & M33;
  hi = ((hi << s31) | (hi >> (31 - s31))) & M31;
  lo = ((lo << s33) | (lo >> (33 - s33))) & M33;
  return (hi << 33) | lo;
}

inline void multi_hash(uint64_t base, unsigned k, unsigned m, uint64_t* out) {
  out[0] = base;
  for (unsigned i = 1; i < m; i++) {
    uint64_t t = base * ((uint64_t)i ^ ((uint64_t)k * MULTI_SEED));
    t ^= t >> MULTI_SHIFT;
    out[i] = t;
  }
}

// h mod bits, with the power-of-two case (the autoscaled production
// filters) reduced to a mask: the generic 64-bit div costs ~20+ cycles and
// shows up in every fill/probe inner loop.
inline uint64_t bf_reduce(uint64_t h, uint64_t bits) {
  return (bits & (bits - 1)) == 0 ? (h & (bits - 1)) : (h % bits);
}

inline bool bf_contains(const uint8_t* arr, uint64_t bits, const uint64_t* hashes,
                        unsigned m) {
  for (unsigned i = 0; i < m; i++) {
    uint64_t b = bf_reduce(hashes[i], bits);
    if (!((arr[b >> 3] >> (b & 7)) & 1)) return false;
  }
  return true;
}

inline void bf_insert(uint8_t* arr, uint64_t bits, const uint64_t* hashes,
                      unsigned m) {
  for (unsigned i = 0; i < m; i++) {
    uint64_t b = bf_reduce(hashes[i], bits);
    arr[b >> 3] |= (uint8_t)(1u << (b & 7));
  }
}

// conservative-update insert capped at threshold; returns resulting count.
inline unsigned cbf_insert_thresh(uint8_t* counters, uint64_t size,
                                  const uint64_t* hashes, unsigned m,
                                  unsigned threshold) {
  uint64_t idx[16];
  uint8_t mn = 255;
  for (unsigned i = 0; i < m; i++) {
    idx[i] = bf_reduce(hashes[i], size);
    if (counters[idx[i]] < mn) mn = counters[idx[i]];
  }
  if (mn >= threshold) return mn;
  for (unsigned i = 0; i < m; i++)
    if (counters[idx[i]] == mn) counters[idx[i]] = (uint8_t)(mn + 1);
  return mn + 1;
}

}  // namespace

extern "C" {

// Canonical multi-hash of every k-window of seq -> out[n_windows * hash_num].
// Rolling recurrence, sequential — used for oracle checks and host builds.
void gp_nthash_all(const uint8_t* seq, int64_t n, uint32_t k, uint32_t hash_num,
                   uint64_t* out) {
  if (n < (int64_t)k) return;
  uint64_t fh = 0, rh = 0;
  for (uint32_t i = 0; i < k; i++) fh = srol(fh) ^ kSeeds.fwd[seq[i]];
  for (uint32_t i = 0; i < k; i++) rh = srol(rh) ^ kSeeds.rc[seq[k - 1 - i]];
  multi_hash(fh + rh, k, hash_num, out);
  const uint64_t m33 = M33, m31 = M31;
  (void)m33;
  (void)m31;
  for (int64_t w = 1; w <= n - (int64_t)k; w++) {
    uint8_t out_c = seq[w - 1], in_c = seq[w + k - 1];
    fh = srol(fh) ^ kSeeds.fwd[in_c] ^ srol_n(kSeeds.fwd[out_c], k);
    // reverse: rh' = sror(rh ^ srol_k(rc[in]) ^ rc[out])
    uint64_t v = rh ^ srol_n(kSeeds.rc[in_c], k) ^ kSeeds.rc[out_c];
    {  // sror
      uint64_t hi = v >> 33, lo = v & M33;
      hi = ((hi >> 1) | (hi << 30)) & M31;
      lo = ((lo >> 1) | (lo << 32)) & M33;
      rh = (hi << 33) | lo;
    }
    multi_hash(fh + rh, k, hash_num, out + (uint64_t)w * hash_num);
  }
}

// The reference fill loop (src/utils.cpp:96-123): per k (escalating
// threshold), insert every k-mer of the read into the counting BF and
// promote to the plain BF at the threshold.
// cbf_arrays[i] has cbf_bytes counters; bf_arrays[i] has bf_bytes bytes.
// Returns 0 on success, -1 on bad args.
int gp_fill_bfs(const uint8_t* seq, int64_t seq_len, uint32_t hash_num,
                const uint32_t* k_values, uint32_t num_k,
                uint32_t kmer_threshold, uint8_t** cbf_arrays,
                uint64_t cbf_bytes, uint8_t** bf_arrays, uint64_t bf_bytes,
                int32_t skip_promoted) {
  if (kmer_threshold < 4 || hash_num > 16) return -1;
  const uint64_t bf_bits = bf_bytes * 8;
  // per-k filters are independent: parallelize the k sweep (each thread
  // owns its own CBF/BF pair, so the conservative-update order within a
  // read stays sequential per k -> bit-identical to the serial loop)
#ifdef _OPENMP
#pragma omp parallel for schedule(static, 1)
#endif
  for (uint32_t ki = 0; ki < num_k; ki++) {
    const unsigned thresh = kmer_threshold - 2 + ki;
    std::vector<uint64_t> hashes(hash_num);
    const uint32_t k = k_values[ki];
    if (seq_len < (int64_t)k) continue;
    uint8_t* cbf = cbf_arrays[ki];
    uint8_t* bf = bf_arrays[ki];
    uint64_t fh = 0, rh = 0;
    for (uint32_t i = 0; i < k; i++) fh = srol(fh) ^ kSeeds.fwd[seq[i]];
    for (uint32_t i = 0; i < k; i++) rh = srol(rh) ^ kSeeds.rc[seq[k - 1 - i]];
    // The fill is random-access bound: every k-mer touches hash_num CBF
    // and/or BF cache lines that are almost never resident.  Pipeline the
    // loop with a lookahead ring — hash position w+D and prefetch its
    // slots while the filter work for position w-th runs on lines already
    // in flight.
    constexpr int64_t D = 8;
    uint64_t ring[D][16];
    const int64_t n_win = seq_len - (int64_t)k + 1;
    for (int64_t w = 0; w < n_win + D; w++) {
      // process the position whose prefetches were issued D iterations ago
      // BEFORE writing this iteration's hashes: p % D == w % D, the ring
      // slot is reused in the same iteration.
      const int64_t p = w - D;
      if (p >= 0) {
        const uint64_t* hs = ring[p % D];
        // skip_promoted: once a k-mer's bits all read set, further CBF
        // counting cannot change the final BF array — a true promotion
        // already inserted them, and a false positive means the insert
        // would set already-set bits.  (CBF counts then diverge from the
        // reference fill; the pipeline discards them post-build.)
        if (!skip_promoted || !bf_contains(bf, bf_bits, hs, hash_num)) {
          if (cbf_insert_thresh(cbf, cbf_bytes, hs, hash_num, thresh) >=
              thresh)
            bf_insert(bf, bf_bits, hs, hash_num);
        }
      }
      if (w < n_win) {
        uint64_t* slot = ring[w % D];
        multi_hash(fh + rh, k, hash_num, slot);
        for (uint32_t i = 0; i < hash_num; i++) {
          __builtin_prefetch(&bf[bf_reduce(slot[i], bf_bits) >> 3], 0, 1);
          __builtin_prefetch(&cbf[bf_reduce(slot[i], cbf_bytes)], 1, 1);
        }
        if (w + 1 < n_win) {
          uint8_t out_c = seq[w], in_c = seq[w + k];
          fh = srol(fh) ^ kSeeds.fwd[in_c] ^ srol_n(kSeeds.fwd[out_c], k);
          uint64_t v = rh ^ srol_n(kSeeds.rc[in_c], k) ^ kSeeds.rc[out_c];
          uint64_t hi = v >> 33, lo = v & M33;
          hi = ((hi >> 1) | (hi << 30)) & M31;
          lo = ((lo >> 1) | (lo << 32)) & M33;
          rh = (hi << 33) | lo;
        }
      }
    }
  }
  return 0;
}

// Batched membership probe: hashes[n * hash_num] against a plain BF.
void gp_bf_contains(const uint8_t* bf, uint64_t bf_bytes, uint32_t hash_num,
                    const uint64_t* hashes, int64_t n, uint8_t* out) {
  const uint64_t bits = bf_bytes * 8;
  for (int64_t i = 0; i < n; i++)
    out[i] = bf_contains(bf, bits, hashes + (uint64_t)i * hash_num, hash_num)
                 ? 1
                 : 0;
}

// FASTA/FASTQ linear-scan indexer (reference: src/seqindex.cpp:12-66).
// Writes a TSV: id \t seq_start_byte \t seq_len \t phred_avg.
// FASTA is assumed 2-line-per-record, FASTQ 4-line (like the reference).
// phred_avg averages quals[0 .. len-2] (reference passes line.size()-1 as
// the length argument, seqindex.cpp:45).
int gp_seqindex_build(const char* seqs_path, const char* out_tsv) {
  FILE* in = std::fopen(seqs_path, "rb");
  if (!in) return -1;
  FILE* out = std::fopen(out_tsv, "w");
  if (!out) {
    std::fclose(in);
    return -2;
  }
  int first = std::fgetc(in);
  bool fastq = (first == '@');
  std::fseek(in, 0, SEEK_SET);
  std::string line;
  line.reserve(1 << 20);
  char buf[1 << 20];
  int64_t byte = 0, i = 0, id_endbyte = 0, seq_start = 0, seq_len = 0;
  std::string id;
  while (std::fgets(buf, sizeof(buf), in)) {
    size_t got = std::strlen(buf);
    line.assign(buf, got);
    while (got == sizeof(buf) - 1 && buf[got - 1] != '\n' &&
           std::fgets(buf, sizeof(buf), in)) {
      got = std::strlen(buf);
      line.append(buf, got);
    }
    bool had_nl = !line.empty() && line.back() == '\n';
    if (had_nl) line.pop_back();
    const int64_t endbyte = byte + (int64_t)line.size();
    if (fastq) {
      if (i % 4 == 0) {
        id_endbyte = endbyte;
        size_t sp = line.find_first_of(" \t");
        id = line.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
      } else if (i % 4 == 1) {
        seq_start = id_endbyte + 1;
        seq_len = endbyte - id_endbyte - 1;
      } else if (i % 4 == 3) {
        double phred = 0.0;
        const size_t qlen = line.size() > 0 ? line.size() - 1 : 0;
        for (size_t q = 0; q < qlen; q++) phred += (double)(line[q] - 33);
        if (qlen) phred /= (double)qlen;
        std::fprintf(out, "%s\t%lld\t%lld\t%g\n", id.c_str(),
                     (long long)seq_start, (long long)seq_len, phred);
      }
    } else {
      if (i % 2 == 0) {
        id_endbyte = endbyte;
        size_t sp = line.find(' ');
        id = line.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
      } else {
        std::fprintf(out, "%s\t%lld\t%lld\t%g\n", id.c_str(),
                     (long long)(id_endbyte + 1),
                     (long long)(endbyte - id_endbyte - 1), 0.0);
      }
    }
    byte = endbyte + (had_nl ? 1 : 0);
    i++;
  }
  std::fclose(in);
  std::fclose(out);
  return 0;
}

}  // extern "C"

namespace {

// canonical multi-hash of the first k bases of `buf`, then helpers to roll.
struct RollState {
  uint64_t fh = 0, rh = 0;
  void seed(const uint8_t* buf, uint32_t k) {
    fh = rh = 0;
    for (uint32_t i = 0; i < k; i++) {
      fh = srol(fh) ^ kSeeds.fwd[buf[i]];
      rh = srol(rh) ^ kSeeds.rc[buf[k - 1 - i]];
    }
  }
  void roll(uint8_t out_c, uint8_t in_c, uint32_t k) {
    fh = srol(fh) ^ kSeeds.fwd[in_c] ^ srol_n(kSeeds.fwd[out_c], k);
    uint64_t v = rh ^ srol_n(kSeeds.rc[in_c], k) ^ kSeeds.rc[out_c];
    uint64_t hi = v >> 33, lo = v & M33;
    hi = ((hi >> 1) | (hi << 30)) & M31;
    lo = ((lo >> 1) | (lo << 32)) & M33;
    rh = (hi << 33) | lo;
  }
  bool probe(const uint8_t* bf, uint64_t bits, uint32_t k, uint32_t m) const {
    uint64_t hs[16];
    multi_hash(fh + rh, k, m, hs);
    return bf_contains(bf, bits, hs, m);
  }
};

// count probes of patch windows listed in j[] (ascending); patch has plen
// bytes; jmax_valid bounds the usable window index (-1 = no bound).
// bail_needed: the smallest count that can still pass the accept rule; once
// cnt + remaining checks < bail_needed the candidate is rejected whatever
// the remaining probes say, and any value below the threshold is
// decision-equivalent (accepted-first comparison logic), so we stop early.
inline int count_patch_probes(const uint8_t* patch, int plen, uint32_t k,
                              uint32_t m, const uint8_t* bf, uint64_t bits,
                              const int32_t* j, int nj, int64_t max_j,
                              int bail_needed = 0) {
  RollState st;
  st.seed(patch, k);
  int cnt = 0, ji = 0, w = 0;
  while (ji < nj && j[ji] < 0) ji++;
  for (;;) {
    if (ji >= nj) break;
    if (bail_needed > 0 && cnt + (nj - ji) < bail_needed) break;
    if (w == j[ji]) {
      if ((max_j < 0 || w <= max_j) && st.probe(bf, bits, k, m)) cnt++;
      ji++;
      if (ji >= nj) break;
    }
    if (w + (int)k >= plen) break;
    st.roll(patch[w], patch[w + k], k);
    w++;
  }
  return cnt;
}

inline uint8_t upper_c(uint8_t c) { return (c >= 'a' && c <= 'z') ? c - 32 : c; }

}  // namespace

extern "C" {

// Batched candidate-support evaluation (semantics of ops/siteeval.py):
// for each site w: gate + sub supports (4 lanes), insertion supports
// (4 x n_combos), deletion supports (max_del).  Tables are passed in so the
// layouts stay single-sourced in Python.
int gp_eval_sites(
    const uint8_t* seq, int64_t n, uint32_t k, uint32_t hash_num,
    const int64_t* sites, int64_t n_sites,
    const uint8_t* bf, uint64_t bf_bytes,
    const uint8_t* sub_cand,        // [256*4]
    const int32_t* sub_cand_n,      // [256]
    const uint8_t* combo_codes,     // [4 * n_combos * max_ins]
    const int32_t* combo_len,       // [n_combos]
    int32_t n_combos, int32_t max_ins, int32_t max_del,
    const int32_t* j_sub, int32_t nj_sub,
    const int32_t* j_ins, int32_t nj_ins,
    const int32_t* j_del, int32_t nj_del,
    int32_t bail_edit, int32_t bail_del,
    int32_t skip_unused,            // skip ins lanes the decision never reads
    uint8_t* gate_out,              // [n_sites*4]
    int32_t* sub_out,               // [n_sites*4]
    int32_t* ins_out,               // [n_sites*4*n_combos] (caller-zeroed)
    int32_t* del_out) {             // [n_sites*max_del]
  if (hash_num > 16 || k > 64) return -1;
  const uint64_t bits = bf_bytes * 8;
  const int L_sub = 2 * k, L_ins = 2 * k + max_ins, L_del = 2 * k - 1;

  int base_row[256];
  std::memset(base_row, 0, sizeof(base_row));
  base_row['A'] = 0; base_row['C'] = 1; base_row['G'] = 2; base_row['T'] = 3;

  // sites are independent (read-only inputs, disjoint output rows):
  // parallelize across them.  Inside fork-pool workers OpenMP is pinned
  // to one thread (utils/procs.py) and this compiles to the serial loop.
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8)
#endif
  for (int64_t si = 0; si < n_sites; si++) {
    std::vector<uint8_t> patch(L_ins + 8, 0);
    std::vector<uint8_t> suffix(k + max_del, 0);
    const int64_t w = sites[si];
    const int64_t p = w + k - 1;
    const uint8_t draft = upper_c(seq[p]);
    // suffix s[p+1 : p+1+k+max_del], zero-padded past the end
    for (int i = 0; i < (int)k + max_del; i++) {
      const int64_t q = p + 1 + i;
      suffix[i] = (q < n) ? seq[q] : 0;
    }
    RollState win;
    win.seed(seq + w, k);
    const uint64_t fh0 = win.fh, rh0 = win.rh;
    const int nc = sub_cand_n[draft];
    // --- substitutions + gate
    bool sub_accepted_any = false;
    // dels are read only by the indel scan, which runs only for a gated,
    // not-yet-accepted candidate (same conditions as the ins skip)
    bool indels_reachable = false;
    for (int ci = 0; ci < 4; ci++) {
      gate_out[si * 4 + ci] = 0;
      sub_out[si * 4 + ci] = 0;
      if (ci >= nc) continue;
      const uint8_t sub = sub_cand[draft * 4 + ci];
      RollState g{fh0, rh0};
      // changelast draft -> sub
      g.fh = fh0 ^ kSeeds.fwd[draft] ^ kSeeds.fwd[sub];
      {
        uint64_t v = srol(rh0) ^ srol_n(kSeeds.rc[draft], k) ^ srol_n(kSeeds.rc[sub], k);
        uint64_t hi = v >> 33, lo = v & M33;
        hi = ((hi >> 1) | (hi << 30)) & M31;
        lo = ((lo >> 1) | (lo << 32)) & M33;
        g.rh = (hi << 33) | lo;
      }
      gate_out[si * 4 + ci] = g.probe(bf, bits, k, hash_num) ? 1 : 0;
      // patch = prefix(k-1) + sub + suffix[:k]  (L = 2k)
      std::memcpy(patch.data(), seq + w, k - 1);
      patch[k - 1] = sub;
      std::memcpy(patch.data() + k, suffix.data(), k);
      sub_out[si * 4 + ci] =
          count_patch_probes(patch.data(), L_sub, k, hash_num, bf, bits,
                             j_sub, nj_sub, -1, bail_edit);
      // The decision loop reads a candidate's insertion supports only when
      // its gate passed, its substitution was NOT accepted, and no earlier
      // gated candidate's substitution was accepted (run_trials /
      // _engine_run_trials both `continue` past the indel scan otherwise).
      // bail_edit is the smallest passing support, so acceptance is
      // detectable here; with bail_edit == 0 we can't know and only the
      // gate skip applies.  Skipped lanes stay at the caller's zeros.
      const bool gated = gate_out[si * 4 + ci] != 0;
      const bool accepted =
          gated && bail_edit > 0 && sub_out[si * 4 + ci] >= bail_edit;
      if (skip_unused && (!gated || accepted || sub_accepted_any)) {
        sub_accepted_any = sub_accepted_any || accepted;
        continue;
      }
      sub_accepted_any = sub_accepted_any || accepted;
      indels_reachable = true;
      // --- insertions for this index char
      const int row = base_row[sub];
      for (int c = 0; c < n_combos; c++) {
        const int m = combo_len[c];
        std::memcpy(patch.data(), seq + w, k - 1);
        std::memcpy(patch.data() + k - 1,
                    combo_codes + ((int64_t)row * n_combos + c) * max_ins, m);
        patch[k - 1 + m] = draft;
        std::memcpy(patch.data() + k + m, suffix.data(), k - 1);
        ins_out[(si * 4 + ci) * n_combos + c] =
            count_patch_probes(patch.data(), k + m + (int)k - 1 + 1 - 1, k,
                               hash_num, bf, bits, j_ins, nj_ins, -1,
                               bail_edit);
      }
    }
    // --- deletions (independent of index char)
    for (int d = 1; d <= max_del && (indels_reachable || !skip_unused); d++) {
      std::memcpy(patch.data(), seq + w, k - 1);
      std::memcpy(patch.data() + k - 1, suffix.data() + d - 1, k);
      // validity: j == 0 needs p+d <= n-1; j > 0 needs p+d+j+1 <= n-1
      int cnt = 0;
      {
        RollState st;
        st.seed(patch.data(), k);
        int ji = 0, w2 = 0;
        for (;;) {
          if (ji >= nj_del) break;
          if (bail_del > 0 && cnt + (nj_del - ji) < bail_del) break;
          if (w2 == j_del[ji]) {
            bool valid = (w2 == 0) ? (p + d <= n - 1)
                                   : (p + d + w2 + 1 <= n - 1);
            if (valid && st.probe(bf, bits, k, hash_num)) cnt++;
            ji++;
            if (ji >= nj_del) break;
          }
          if (w2 + (int)k >= L_del) break;
          st.roll(patch[w2], patch[w2 + k], k);
          w2++;
        }
      }
      del_out[si * max_del + (d - 1)] = cnt;
    }
  }
  return 0;
}

// Bulk clean-run for the editing walk (ntedit.cpp:1461-1760 fast path):
// from a window whose hashes are (fh0, rh0) over seg[0..seg_len), roll
// forward probing every window.  Stops at the first missing window (state
// kept AT that window, *stopped_missing = 1), at the first incoming char
// not in accept_tab (state kept at the last clean window before it), or
// after max_steps rolls.  Returns the number of rolls performed; hashes
// after those rolls land in *fh_out / *rh_out.  Probes are primary-BF
// canonical probes, bit-identical to the Python _probe_fr_primary.
int64_t gp_clean_run(
    const uint8_t* seg, int64_t seg_len, uint32_t k, uint32_t hash_num,
    const uint8_t* bf, uint64_t bf_bytes,
    const uint8_t* accept_tab,  // [256] 1 = is_accepted (ATGC + IUPAC)
    uint64_t fh0, uint64_t rh0, int64_t max_steps,
    uint64_t* fh_out, uint64_t* rh_out, int32_t* stopped_missing) {
  const uint64_t bits = bf_bytes * 8;
  RollState st{fh0, rh0};
  int64_t m = 0;
  *stopped_missing = 0;
  if (max_steps > seg_len - (int64_t)k) max_steps = seg_len - (int64_t)k;
  for (int64_t i = 1; i <= max_steps; i++) {
    const uint8_t cin = seg[i + k - 1];
    if (!accept_tab[cin]) break;
    st.roll(seg[i - 1], cin, k);
    m = i;
    if (!st.probe(bf, bits, k, hash_num)) {
      *stopped_missing = 1;
      break;
    }
  }
  *fh_out = st.fh;
  *rh_out = st.rh;
  return m;
}

// Seed the forward/reverse rolling-hash state of one k-window (the scalar
// ntc64_base recurrence, nthash.hpp) — used by the engine when re-anchoring
// the walk at a hot site.
void gp_seed_window(const uint8_t* buf, uint32_t k,
                    uint64_t* fh_out, uint64_t* rh_out) {
  RollState st;
  st.seed(buf, k);
  *fh_out = st.fh;
  *rh_out = st.rh;
}

}  // extern "C"
