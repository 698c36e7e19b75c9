//------------------------------------------------------------------------------
// hctpu — native host runtime for the huffman_codec_tpu framework.
//
// A from-scratch C++17 implementation of the v1 (reference-compatible) codec
// pipeline plus the framework's chunked v2 container. Not a translation of
// the upstream reference (pointer tree, recursive O(n) successor scan, byte
// deques): this runtime uses
//   * an array-slot FGK tree (slot k == nodeNum 512-k; swaps exchange slot
//     contents, positions keep their parents),
//   * an O(log n) prefix binary search for the swap successor (the "fast
//     rule", cross-validated against the reference's pruned DFS by the test
//     suite; an exact-DFS mode is kept selectable for auditing),
//   * a 64-bit MSB-first bit writer / branch-free bit reader,
//   * std::thread fan-out over adaptive block sizes and over v2 chunks (the
//     host-side mirror of the TPU data-parallel chunk design).
//
// Wire-format parity citations (reference file:line) are given inline.
//------------------------------------------------------------------------------

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

using std::size_t;
using std::uint64_t;
using std::uint8_t;
using Bytes = std::vector<uint8_t>;

// Error codes mirror the reference exit codes (SURVEY.md §2.7).
enum HcStatus : int {
    HC_OK = 0,
    HC_E_BAD_SIZE_FOR_WIDTH = 6,   // main.cpp:54-58
    HC_E_BAD_HUFF_HEADER = 8,      // main.cpp:99-104
    HC_E_HUFF_UNDERRUN = 9,        // transform.cpp:393-398
    HC_E_BAD_ADAPT_HEADER = 10,    // headers.cpp:67-71
    HC_E_BAD_ADAPT_DIRS = 11,      // headers.cpp:94-98
    HC_E_SMALL_MATRIX = 12,        // transform.cpp:300-304
    HC_E_BLOCK_OVERSHOOT = 13,     // transform.cpp:180-184
    HC_E_BLOCK_UNDERRUN = 14,      // transform.cpp:170-174
    HC_E_LEFTOVER = 15,            // transform.cpp:354-358
    HC_E_BAD_V2 = 40,
    HC_E_INTERNAL = 99,
};

namespace {

//------------------------------------------------------------------------------
// bit IO (v1 order: MSB-first within bytes, main.cpp:78-84 / 107-113)
//------------------------------------------------------------------------------

struct BitWriter {
    Bytes out;
    uint64_t acc = 0;
    int nbits = 0;

    inline void push(int bit) {
        acc = (acc << 1) | unsigned(bit & 1);
        if (++nbits == 64) flush_word();
    }
    void flush_word() {
        size_t p = out.size();
        out.resize(p + 8);
        for (int i = 0; i < 8; i++) out[p + i] = uint8_t(acc >> (56 - 8 * i));
        acc = 0;
        nbits = 0;
    }
    uint64_t bit_length() const { return out.size() * 8 + nbits; }
    // pad with 0 bits to a byte boundary (transform.cpp:378-381)
    void finish() {
        while (nbits % 8) push(0);
        if (nbits) {
            int bytes = nbits / 8;
            uint64_t a = acc;
            for (int i = bytes - 1; i >= 0; i--) {
                out.push_back(uint8_t(a >> (8 * i)));
            }
            acc = 0;
            nbits = 0;
        }
    }
};

struct BitReader {
    const uint8_t* buf;
    uint64_t nbits;
    uint64_t pos = 0;

    BitReader(const uint8_t* b, uint64_t bit_count) : buf(b), nbits(bit_count) {}
    inline bool empty() const { return pos >= nbits; }
    inline int next() {
        int b = (buf[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        return b;
    }
};

//------------------------------------------------------------------------------
// FGK adaptive Huffman tree (behavior model: huffman.cpp; layout: ours)
//------------------------------------------------------------------------------

constexpr int MAX_SYMBOLS = 256;          // huffman.hpp:19
constexpr int MAX_NODES = 2 * MAX_SYMBOLS + 1;
constexpr int NIL = -1;

struct FGK {
    int16_t parent[MAX_NODES];
    int16_t left[MAX_NODES];
    int16_t right[MAX_NODES];
    uint64_t freq[MAX_NODES];
    uint8_t symbol[MAX_NODES];
    int16_t symslot[MAX_SYMBOLS];
    int n_slots;
    int nyt;
    bool exact_dfs;  // audit mode: replicate huffman.cpp:157-184 literally

    void init(bool exact) {
        parent[0] = left[0] = right[0] = NIL;
        freq[0] = 0;
        n_slots = 1;
        nyt = 0;
        exact_dfs = exact;
        for (int i = 0; i < MAX_SYMBOLS; i++) symslot[i] = NIL;
    }

    inline bool leaf(int k) const { return left[k] == NIL; }

    // fast rule: lowest slot with freq == f in the clean sorted prefix
    // [0..k_slot] (see pyref.fgk.fast_find_succ_slot for the argument).
    inline int find_fast(uint64_t f, int k_slot) const {
        int lo = 0, hi = k_slot + 1;
        while (lo < hi) {
            int mid = (lo + hi) >> 1;
            if (freq[mid] > f) lo = mid + 1; else hi = mid;
        }
        return (lo <= k_slot && freq[lo] == f) ? lo : NIL;
    }

    // exact model of the reference's pruned DFS preferring higher nodeNums
    // (== lower slots), huffman.cpp:157-184.
    int find_dfs(int k, uint64_t f) const {
        if (!leaf(k) && freq[k] > f) {
            int l = find_dfs(left[k], f);
            int r = find_dfs(right[k], f);
            if (l != NIL && r != NIL) return l < r ? l : r;
            return l != NIL ? l : r;
        }
        return freq[k] == f ? k : NIL;
    }

    // exchange subtree contents of two slots; positions keep their parents
    // (net effect of huffman.cpp:186-217 in slot space)
    inline void swap_slots(int a, int b) {
        std::swap(freq[a], freq[b]);
        std::swap(symbol[a], symbol[b]);
        std::swap(left[a], left[b]);
        std::swap(right[a], right[b]);
        for (int k : {a, b}) {
            if (left[k] != NIL) {
                parent[left[k]] = int16_t(k);
                parent[right[k]] = int16_t(k);
            } else {
                symslot[symbol[k]] = int16_t(k);
            }
        }
    }

    // the invariant maintainer (huffman.cpp:95-128)
    void update(uint8_t sym) {
        int k = symslot[sym];
        if (k == NIL) {
            // NYT split (huffman.cpp:99-111): leaf = right child (NYT-1),
            // new NYT = left child (NYT-2)
            int old = nyt, lf = old + 1, nn = old + 2;
            left[old] = int16_t(nn);
            right[old] = int16_t(lf);
            parent[lf] = parent[nn] = int16_t(old);
            left[lf] = right[lf] = left[nn] = right[nn] = NIL;
            freq[lf] = freq[nn] = 0;
            symbol[lf] = sym;
            nyt = nn;
            symslot[sym] = int16_t(lf);
            n_slots = nn + 1;
            k = lf;
        }
        while (parent[k] != NIL) {
            uint64_t f = freq[k];
            int succ = exact_dfs ? find_dfs(0, f) : find_fast(f, k);
            if (succ != NIL && succ != k && succ != parent[k]) {
                swap_slots(k, succ);
                k = succ;
            }
            freq[k]++;
            k = parent[k];
        }
        freq[k]++;
    }

    // encode: seen symbol -> root-path code; unseen -> NYT code ++ 8 raw
    // MSB-first bits (huffman.cpp:37-58); bits emitted via climb+reverse
    inline void encode(uint8_t sym, BitWriter& bw) {
        int k = symslot[sym];
        bool fresh = (k == NIL);
        if (fresh) k = nyt;
        uint8_t path[MAX_NODES];
        int len = 0;
        while (parent[k] != NIL) {
            int p = parent[k];
            path[len++] = uint8_t(left[p] != k);
            k = p;
        }
        while (len) bw.push(path[--len]);
        if (fresh) {
            for (int i = 7; i >= 0; i--) bw.push((sym >> i) & 1);
        }
    }

    // decode one symbol: root->leaf walk, NYT -> 8 raw bits (huffman.cpp:60-93)
    inline int decode(BitReader& br) {
        int k = 0;
        while (!leaf(k)) {
            if (br.empty()) return -1;
            k = br.next() ? right[k] : left[k];
        }
        if (k == nyt) {
            int sym = 0;
            for (int i = 0; i < 8; i++) {
                if (br.empty()) return -1;
                sym = (sym << 1) | br.next();
            }
            return sym;
        }
        return symbol[k];
    }
};

void fgk_encode_stream(const uint8_t* data, uint64_t n, BitWriter& bw, bool exact) {
    FGK t;
    t.init(exact);
    for (uint64_t i = 0; i < n; i++) {
        t.encode(data[i], bw);
        t.update(data[i]);
    }
}

int fgk_decode_stream(BitReader& br, uint64_t count, Bytes& out, bool exact) {
    // every symbol consumes at least one bit, so a count beyond the number of
    // available bits can only end in underrun — fail fast instead of trying
    // to reserve an absurd (possibly corrupt-header) amount of memory
    if (count > br.nbits - br.pos) return HC_E_HUFF_UNDERRUN;
    FGK t;
    t.init(exact);
    out.reserve(out.size() + count);
    for (uint64_t i = 0; i < count; i++) {
        int sym = t.decode(br);
        if (sym < 0) return HC_E_HUFF_UNDERRUN;
        t.update(uint8_t(sym));
        out.push_back(uint8_t(sym));
    }
    return HC_OK;
}

//------------------------------------------------------------------------------
// diff model (transform.cpp:220-239)
//------------------------------------------------------------------------------

void diff_apply(uint8_t* v, uint64_t n) {
    uint8_t prev = 0;
    for (uint64_t i = 0; i < n; i++) {
        uint8_t cur = v[i];
        v[i] = uint8_t(cur - prev);
        prev = cur;
    }
}

void diff_revert(uint8_t* v, uint64_t n) {
    uint8_t acc = 0;
    for (uint64_t i = 0; i < n; i++) {
        acc = uint8_t(acc + v[i]);
        v[i] = acc;
    }
}

//------------------------------------------------------------------------------
// MNP-5 RLE (transform.cpp:241-292; format quirks per SURVEY.md §2.3)
//------------------------------------------------------------------------------

void rle_encode(const uint8_t* v, uint64_t n, Bytes& out) {
    uint8_t match = 0;
    int count = 0;
    for (uint64_t i = 0; i < n; i++) {
        uint8_t b = v[i];
        if (b == match && count != 0 && i + 1 != n) {
            count++;
            if (count <= 3) out.push_back(b);
            else if (count == 258) {  // 255 + 3 -> max count byte, reset
                out.push_back(255);
                count = 0;
            }
        } else {
            if (count >= 3) out.push_back(uint8_t(count - 3));
            out.push_back(b);
            match = b;
            count = 1;
        }
    }
}

struct RLEDecoder {
    uint8_t match = 0;
    int count = 0;
    inline void step(uint8_t cur, Bytes& out) {  // transform.cpp:137-159
        if (count == 3) {
            out.insert(out.end(), size_t(cur), match);
            count = 0;
        } else {
            out.push_back(cur);
            if (match == cur) count++;
            else { match = cur; count = 1; }
        }
    }
};

void rle_decode_all(const uint8_t* v, uint64_t n, Bytes& out) {
    RLEDecoder d;
    for (uint64_t i = 0; i < n; i++) d.step(v[i], out);
}

//------------------------------------------------------------------------------
// adaptive block RLE (transform.cpp:25-134, 294-361)
//------------------------------------------------------------------------------

constexpr uint64_t INIT_RLE_BLOCK_SIZE = 8;   // transform.hpp:17
constexpr int MAX_RLE_DOUBLING_STEPS = 7;     // transform.hpp:18

inline uint64_t block_count(uint64_t w, uint64_t h, uint64_t bs) {
    return ((w + bs - 1) / bs) * ((h + bs - 1) / bs);
}

struct BlockGeom { uint64_t base, sx, sy; };

inline BlockGeom block_geom(uint64_t w, uint64_t h, uint64_t bs, uint64_t i) {
    uint64_t per_line = (w + bs - 1) / bs;
    uint64_t bx = (i % per_line) * bs;
    uint64_t by = (i / per_line) * bs;
    return {by * w + bx, std::min(bs, w - bx), std::min(bs, h - by)};
}

void gather_block(const uint8_t* m, uint64_t w, const BlockGeom& g,
                  bool horizontal, Bytes& out) {
    out.clear();
    out.reserve(g.sx * g.sy);
    if (horizontal) {
        for (uint64_t y = 0; y < g.sy; y++) {
            const uint8_t* row = m + g.base + y * w;
            out.insert(out.end(), row, row + g.sx);
        }
    } else {  // column-major (transform.cpp:79-91 with extents swapped)
        for (uint64_t x = 0; x < g.sx; x++)
            for (uint64_t y = 0; y < g.sy; y++)
                out.push_back(m[g.base + y * w + x]);
    }
}

void scatter_block(uint8_t* m, const Bytes& blk, uint64_t w,
                   const BlockGeom& g, bool horizontal) {
    size_t idx = 0;
    if (horizontal) {
        for (uint64_t y = 0; y < g.sy; y++) {
            std::memcpy(m + g.base + y * w, blk.data() + idx, g.sx);
            idx += g.sx;
        }
    } else {
        for (uint64_t x = 0; x < g.sx; x++)
            for (uint64_t y = 0; y < g.sy; y++)
                m[g.base + y * w + x] = blk[idx++];
    }
}

// big-endian u64 (headers.cpp:27-37 — opposite of the outer LE header)
inline void push_u64_be(Bytes& out, uint64_t v) {
    for (int i = 7; i >= 0; i--) out.push_back(uint8_t(v >> (8 * i)));
}

// one block size: per tile RLE both scans, horizontal wins ties -> dir bit 1
// (transform.cpp:97-134); output = header ++ winning tile streams
Bytes adapt_encode_fixed(const uint8_t* m, uint64_t w, uint64_t h, uint64_t bs) {
    uint64_t nb = block_count(w, h, bs);
    std::vector<bool> dirs;
    dirs.reserve(nb);
    Bytes block_data, tile, hor, ver;
    for (uint64_t i = 0; i < nb; i++) {
        BlockGeom g = block_geom(w, h, bs, i);
        gather_block(m, w, g, true, tile);
        hor.clear();
        rle_encode(tile.data(), tile.size(), hor);
        gather_block(m, w, g, false, tile);
        ver.clear();
        rle_encode(tile.data(), tile.size(), ver);
        if (hor.size() <= ver.size()) {
            dirs.push_back(true);
            block_data.insert(block_data.end(), hor.begin(), hor.end());
        } else {
            dirs.push_back(false);
            block_data.insert(block_data.end(), ver.begin(), ver.end());
        }
    }
    Bytes out;
    push_u64_be(out, w);
    push_u64_be(out, h);
    push_u64_be(out, bs);
    uint8_t acc = 0;
    int nbit = 0;
    for (bool d : dirs) {  // MSB-first, 0-padded (headers.cpp:41-60)
        acc = uint8_t((acc << 1) | (d ? 1 : 0));
        if (++nbit == 8) { out.push_back(acc); acc = 0; nbit = 0; }
    }
    if (nbit) out.push_back(uint8_t(acc << (8 - nbit)));
    out.insert(out.end(), block_data.begin(), block_data.end());
    return out;
}

// auto block-size search, strictly-smaller wins (the `<` at
// transform.cpp:319 keeps the smaller block size on ties); candidate sizes
// evaluated concurrently (std::thread) — they are independent full passes.
int adapt_encode_auto(const uint8_t* m, uint64_t w, uint64_t h, int n_threads,
                      Bytes& best) {
    if (w < INIT_RLE_BLOCK_SIZE || h < INIT_RLE_BLOCK_SIZE)
        return HC_E_SMALL_MATRIX;
    std::vector<uint64_t> sizes;
    uint64_t bs = INIT_RLE_BLOCK_SIZE;
    for (int step = 0; step <= MAX_RLE_DOUBLING_STEPS; step++) {
        if (step > 0 && (bs > w || bs > h)) break;
        sizes.push_back(bs);
        bs *= 2;
    }
    std::vector<Bytes> results(sizes.size());
    if (n_threads > 1 && sizes.size() > 1) {
        std::vector<std::thread> pool;
        for (size_t i = 0; i < sizes.size(); i++)
            pool.emplace_back([&, i] { results[i] = adapt_encode_fixed(m, w, h, sizes[i]); });
        for (auto& t : pool) t.join();
    } else {
        for (size_t i = 0; i < sizes.size(); i++)
            results[i] = adapt_encode_fixed(m, w, h, sizes[i]);
    }
    size_t best_i = 0;
    for (size_t i = 1; i < results.size(); i++)
        if (results[i].size() < results[best_i].size()) best_i = i;
    best = std::move(results[best_i]);
    return HC_OK;
}

int adapt_decode(const Bytes& data, Bytes& out) {
    if (data.size() < 24) return HC_E_BAD_ADAPT_HEADER;
    uint64_t w = 0, h = 0, bs = 0;
    size_t pos = 0;
    for (int i = 0; i < 8; i++) w = (w << 8) | data[pos++];
    for (int i = 0; i < 8; i++) h = (h << 8) | data[pos++];
    for (int i = 0; i < 8; i++) bs = (bs << 8) | data[pos++];
    if (bs == 0) return HC_E_BAD_ADAPT_HEADER;
    uint64_t nb = block_count(w, h, bs);
    uint64_t dir_bytes = (nb + 7) / 8;
    // scanDir availability is checked BEFORE any plausibility guard so the
    // exit code matches the reference order (headers.cpp:94-98 -> 11)
    if (data.size() < pos + dir_bytes) return HC_E_BAD_ADAPT_DIRS;
    // a corrupt header can claim any W/H; RLE expands at most 255x per input
    // byte, so a matrix larger than that bound is guaranteed to underrun —
    // fail with 14 (the code the reference would eventually hit) instead of
    // attempting the giant allocation
    if (w != 0 && h != 0 &&
        (unsigned __int128)w * h > (unsigned __int128)data.size() * 255)
        return HC_E_BLOCK_UNDERRUN;
    const uint8_t* dirs = data.data() + pos;
    pos += dir_bytes;

    out.assign(w * h, 0);
    Bytes blk;
    for (uint64_t i = 0; i < nb; i++) {
        BlockGeom g = block_geom(w, h, bs, i);
        uint64_t need = g.sx * g.sy;
        blk.clear();
        RLEDecoder d;
        while (blk.size() < need) {  // transform.cpp:162-187
            if (pos >= data.size()) return HC_E_BLOCK_UNDERRUN;
            d.step(data[pos++], blk);
        }
        if (blk.size() != need) return HC_E_BLOCK_OVERSHOOT;
        bool hor = (dirs[i / 8] >> (7 - (i % 8))) & 1;
        scatter_block(out.data(), blk, w, g, hor);
    }
    if (pos != data.size()) return HC_E_LEFTOVER;
    return HC_OK;
}

//------------------------------------------------------------------------------
// v1 container (main.cpp:39-128; headers.cpp:107-125)
//------------------------------------------------------------------------------

int v1_compress(const uint8_t* in, uint64_t n, bool use_diff, bool use_adapt,
                uint64_t width, bool exact, int n_threads, Bytes& out) {
    if (use_adapt && width != 0 && (n % width) != 0) return HC_E_BAD_SIZE_FOR_WIDTH;
    Bytes work(in, in + n);
    if (use_diff) diff_apply(work.data(), work.size());
    Bytes transformed;
    if (use_adapt) {
        uint64_t h = width ? n / width : 0;
        int rc = adapt_encode_auto(work.data(), width, h, n_threads, transformed);
        if (rc != HC_OK) return rc;
    } else {
        transformed.reserve(n + n / 255 + 8);
        rle_encode(work.data(), work.size(), transformed);
    }
    BitWriter bw;
    fgk_encode_stream(transformed.data(), transformed.size(), bw, exact);
    bw.finish();

    out.clear();
    out.reserve(9 + bw.out.size());
    uint64_t count = transformed.size();  // POST-transform count (main.cpp:75)
    for (int i = 0; i < 8; i++) out.push_back(uint8_t(count >> (8 * i)));  // LE
    out.push_back(uint8_t((use_diff ? 0x80 : 0) | (use_adapt ? 0x40 : 0)));
    out.insert(out.end(), bw.out.begin(), bw.out.end());
    return HC_OK;
}

int v1_decompress(const uint8_t* in, uint64_t n, bool exact, Bytes& out) {
    if (n < 9) return HC_E_BAD_HUFF_HEADER;
    uint64_t count = 0;
    for (int i = 7; i >= 0; i--) count = (count << 8) | in[i];
    bool use_diff = (in[8] >> 7) & 1;
    bool use_adapt = (in[8] >> 6) & 1;
    BitReader br(in + 9, (n - 9) * 8);
    Bytes decoded;
    int rc = fgk_decode_stream(br, count, decoded, exact);
    if (rc != HC_OK) return rc;
    out.clear();
    if (use_adapt) {
        rc = adapt_decode(decoded, out);
        if (rc != HC_OK) return rc;
    } else {
        out.reserve(decoded.size() * 2);
        rle_decode_all(decoded.data(), decoded.size(), out);
    }
    if (use_diff) diff_revert(out.data(), out.size());
    return HC_OK;
}

//------------------------------------------------------------------------------
// v2 chunked container (framework-native; see formats.py for the layout).
// Transforms are global; the post-transform symbol stream is split into
// fixed-size chunks, each FGK-encoded with an independent tree — chunks are
// embarrassingly parallel on host threads here and across TPU cores in the
// JAX path.
//------------------------------------------------------------------------------

constexpr char V2_MAGIC[6] = {'H', 'C', 'T', 'P', 'U', '\x02'};

inline void push_u64_le(Bytes& out, uint64_t v) {
    for (int i = 0; i < 8; i++) out.push_back(uint8_t(v >> (8 * i)));
}
inline void push_u32_le(Bytes& out, uint32_t v) {
    for (int i = 0; i < 4; i++) out.push_back(uint8_t(v >> (8 * i)));
}

int v2_compress(const uint8_t* in, uint64_t n, bool use_diff, bool use_adapt,
                uint64_t width, uint32_t chunk_size, int n_threads, Bytes& out) {
    if (chunk_size == 0) return HC_E_BAD_V2;
    if (use_adapt && width != 0 && (n % width) != 0) return HC_E_BAD_SIZE_FOR_WIDTH;
    Bytes work(in, in + n);
    if (use_diff) diff_apply(work.data(), work.size());
    Bytes transformed;
    if (use_adapt) {
        uint64_t h = width ? n / width : 0;
        int rc = adapt_encode_auto(work.data(), width, h, n_threads, transformed);
        if (rc != HC_OK) return rc;
    } else {
        transformed.reserve(n + n / 255 + 8);
        rle_encode(work.data(), work.size(), transformed);
    }

    uint64_t total = transformed.size();
    uint32_t n_chunks = uint32_t((total + chunk_size - 1) / chunk_size);
    std::vector<Bytes> streams(n_chunks);
    std::vector<uint64_t> chunk_bits(n_chunks);
    auto encode_range = [&](uint32_t lo, uint32_t hi) {
        for (uint32_t c = lo; c < hi; c++) {
            uint64_t off = uint64_t(c) * chunk_size;
            uint64_t len = std::min<uint64_t>(chunk_size, total - off);
            BitWriter bw;
            fgk_encode_stream(transformed.data() + off, len, bw, false);
            chunk_bits[c] = bw.bit_length();
            bw.finish();
            streams[c] = std::move(bw.out);
        }
    };
    int threads = std::max(1, n_threads);
    if (threads > 1 && n_chunks > 1) {
        uint32_t per = (n_chunks + threads - 1) / threads;
        std::vector<std::thread> pool;
        for (int t = 0; t < threads; t++) {
            uint32_t lo = uint32_t(t) * per;
            uint32_t hi = std::min<uint32_t>(n_chunks, lo + per);
            if (lo >= hi) break;
            pool.emplace_back(encode_range, lo, hi);
        }
        for (auto& th : pool) th.join();
    } else {
        encode_range(0, n_chunks);
    }

    out.clear();
    out.insert(out.end(), V2_MAGIC, V2_MAGIC + 6);
    out.push_back(1);  // version
    out.push_back(uint8_t((use_diff ? 0x80 : 0) | (use_adapt ? 0x40 : 0)));
    push_u64_le(out, n);
    push_u64_le(out, total);
    push_u32_le(out, chunk_size);
    push_u32_le(out, n_chunks);
    for (uint32_t c = 0; c < n_chunks; c++) push_u64_le(out, chunk_bits[c]);
    for (uint32_t c = 0; c < n_chunks; c++)
        out.insert(out.end(), streams[c].begin(), streams[c].end());
    return HC_OK;
}

int v2_decompress(const uint8_t* in, uint64_t n, int n_threads, Bytes& out) {
    if (n < 32 || std::memcmp(in, V2_MAGIC, 6) != 0 || in[6] != 1)
        return HC_E_BAD_V2;
    bool use_diff = (in[7] >> 7) & 1;
    bool use_adapt = (in[7] >> 6) & 1;
    auto u64 = [&](uint64_t p) {
        uint64_t v = 0;
        for (int i = 7; i >= 0; i--) v = (v << 8) | in[p + i];
        return v;
    };
    auto u32 = [&](uint64_t p) {
        uint32_t v = 0;
        for (int i = 3; i >= 0; i--) v = (v << 8) | in[p + i];
        return v;
    };
    uint64_t orig_size = u64(8);
    uint64_t total = u64(16);
    uint32_t chunk_size = u32(24);
    uint32_t n_chunks = u32(28);
    if (chunk_size == 0 && n_chunks != 0) return HC_E_BAD_V2;
    // manifest consistency: chunk grid must tile the symbol stream exactly
    uint64_t expect_chunks =
        chunk_size ? (total + chunk_size - 1) / chunk_size : 0;
    if (n_chunks != expect_chunks) return HC_E_BAD_V2;
    uint64_t pos = 32;
    if (n < pos + 8ull * n_chunks) return HC_E_BAD_V2;
    std::vector<uint64_t> chunk_bits(n_chunks);
    std::vector<uint64_t> chunk_off(n_chunks + 1, 0);
    for (uint32_t c = 0; c < n_chunks; c++) {
        chunk_bits[c] = u64(pos);
        pos += 8;
    }
    for (uint32_t c = 0; c < n_chunks; c++)
        chunk_off[c + 1] = chunk_off[c] + (chunk_bits[c] + 7) / 8;
    if (n < pos + chunk_off[n_chunks]) return HC_E_BAD_V2;
    // every symbol takes >= 1 bit, so total beyond the payload bit count is
    // corrupt — reject before allocating
    if (total > chunk_off[n_chunks] * 8) return HC_E_BAD_V2;
    const uint8_t* payload = in + pos;

    Bytes transformed(total);
    std::vector<int> rcs(std::max(1u, n_chunks), HC_OK);
    auto decode_range = [&](uint32_t lo, uint32_t hi) {
        Bytes tmp;
        for (uint32_t c = lo; c < hi; c++) {
            uint64_t off = uint64_t(c) * chunk_size;
            uint64_t len = std::min<uint64_t>(chunk_size, total - off);
            BitReader br(payload + chunk_off[c], chunk_bits[c]);
            tmp.clear();
            int rc = fgk_decode_stream(br, len, tmp, false);
            if (rc != HC_OK) { rcs[c] = rc; return; }
            std::memcpy(transformed.data() + off, tmp.data(), len);
        }
    };
    int threads = std::max(1, n_threads);
    if (threads > 1 && n_chunks > 1) {
        uint32_t per = (n_chunks + threads - 1) / threads;
        std::vector<std::thread> pool;
        for (int t = 0; t < threads; t++) {
            uint32_t lo = uint32_t(t) * per;
            uint32_t hi = std::min<uint32_t>(n_chunks, lo + per);
            if (lo >= hi) break;
            pool.emplace_back(decode_range, lo, hi);
        }
        for (auto& th : pool) th.join();
    } else {
        decode_range(0, n_chunks);
    }
    for (int rc : rcs)
        if (rc != HC_OK) return rc;

    out.clear();
    if (use_adapt) {
        int rc = adapt_decode(transformed, out);
        if (rc != HC_OK) return rc;
    } else {
        // clamp the hint: a corrupt orig_size must not drive the allocator
        out.reserve(std::min<uint64_t>(orig_size, transformed.size() * 255 + 16));
        rle_decode_all(transformed.data(), transformed.size(), out);
    }
    if (use_diff) diff_revert(out.data(), out.size());
    if (out.size() != orig_size) return HC_E_BAD_V2;
    return HC_OK;
}

int pack_result(const Bytes& v, uint8_t** out, uint64_t* out_n) {
    *out_n = v.size();
    *out = static_cast<uint8_t*>(std::malloc(v.size() ? v.size() : 1));
    if (!*out) return HC_E_INTERNAL;
    std::memcpy(*out, v.data(), v.size());
    return HC_OK;
}

}  // namespace

//------------------------------------------------------------------------------
// C API (ctypes surface)
//------------------------------------------------------------------------------

extern "C" {

int hctpu_v1_compress(const uint8_t* in, uint64_t n, int use_diff,
                      int use_adapt, uint64_t width, int exact, int n_threads,
                      uint8_t** out, uint64_t* out_n) {
    Bytes result;
    int rc = v1_compress(in, n, use_diff, use_adapt, width, exact, n_threads,
                         result);
    if (rc != HC_OK) return rc;
    return pack_result(result, out, out_n);
}

int hctpu_v1_decompress(const uint8_t* in, uint64_t n, int exact,
                        uint8_t** out, uint64_t* out_n) {
    Bytes result;
    int rc = v1_decompress(in, n, exact, result);
    if (rc != HC_OK) return rc;
    return pack_result(result, out, out_n);
}

int hctpu_v2_compress(const uint8_t* in, uint64_t n, int use_diff,
                      int use_adapt, uint64_t width, uint32_t chunk_size,
                      int n_threads, uint8_t** out, uint64_t* out_n) {
    Bytes result;
    int rc = v2_compress(in, n, use_diff, use_adapt, width, chunk_size,
                         n_threads, result);
    if (rc != HC_OK) return rc;
    return pack_result(result, out, out_n);
}

int hctpu_v2_decompress(const uint8_t* in, uint64_t n, int n_threads,
                        uint8_t** out, uint64_t* out_n) {
    Bytes result;
    int rc = v2_decompress(in, n, n_threads, result);
    if (rc != HC_OK) return rc;
    return pack_result(result, out, out_n);
}

int hctpu_rle_encode(const uint8_t* in, uint64_t n, uint8_t** out,
                     uint64_t* out_n) {
    Bytes result;
    result.reserve(n + n / 255 + 8);
    rle_encode(in, n, result);
    return pack_result(result, out, out_n);
}

int hctpu_rle_decode(const uint8_t* in, uint64_t n, uint8_t** out,
                     uint64_t* out_n) {
    Bytes result;
    rle_decode_all(in, n, result);
    return pack_result(result, out, out_n);
}

void hctpu_free(uint8_t* p) { std::free(p); }

}  // extern "C"
