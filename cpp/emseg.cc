// emseg: native segmentation post-processing core.
//
// TPU-native replacement for the reference's compiled dependencies
// (SURVEY §2.3): mahotas (distance transform, regional maxima, connected
// components, seeded watershed — inference_code/utils/fragment.py:15-53) and
// waterz (region-graph mean-affinity agglomeration —
// inference_code/inference_seg.py:148-153). C ABI, bound via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC emseg.cc -o libemseg.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <cmath>
#include <limits>
#include <memory>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Squared Euclidean distance transform (Felzenszwalb-Huttenlocher, 2 passes).
// Distance of each nonzero pixel to the nearest zero pixel; matches
// mahotas.distance(bw) whose default metric is squared euclidean.
// ---------------------------------------------------------------------------

static void edt_1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<float>::infinity();
  z[1] = std::numeric_limits<float>::infinity();
  for (int q = 1; q < n; q++) {
    float s;
    while (true) {
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) { k--; } else break;
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<float>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    d[q] = (q - v[k]) * (q - v[k]) + f[v[k]];
  }
}

void edt2d_sq(const uint8_t* mask, int h, int w, float* out) {
  const float INF = 1e20f;
  std::vector<float> tmp(static_cast<size_t>(h) * w);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      tmp[(size_t)y * w + x] = mask[(size_t)y * w + x] ? INF : 0.0f;

  std::vector<float> col(h), dcol(h);
  std::vector<int> v(std::max(h, w) + 1);
  std::vector<float> z(std::max(h, w) + 2);
  // columns
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) col[y] = tmp[(size_t)y * w + x];
    edt_1d(col.data(), dcol.data(), h, v.data(), z.data());
    for (int y = 0; y < h; y++) tmp[(size_t)y * w + x] = dcol[y];
  }
  // rows
  std::vector<float> drow(w);
  for (int y = 0; y < h; y++) {
    edt_1d(&tmp[(size_t)y * w], drow.data(), w, v.data(), z.data());
    std::memcpy(&out[(size_t)y * w], drow.data(), sizeof(float) * w);
  }
}

// ---------------------------------------------------------------------------
// Connected-component labeling (4- or 8-connectivity), BFS.
// Returns the number of components; labels start at 1.
// ---------------------------------------------------------------------------

int label2d(const uint8_t* mask, int h, int w, int conn, int32_t* out) {
  std::fill(out, out + (size_t)h * w, 0);
  const int dx4[] = {1, -1, 0, 0}, dy4[] = {0, 0, 1, -1};
  const int dx8[] = {1, -1, 0, 0, 1, 1, -1, -1}, dy8[] = {0, 0, 1, -1, 1, -1, 1, -1};
  const int* dx = conn == 8 ? dx8 : dx4;
  const int* dy = conn == 8 ? dy8 : dy4;
  int nn = conn == 8 ? 8 : 4;
  int next = 0;
  std::vector<int64_t> stack;
  for (int64_t p = 0; p < (int64_t)h * w; p++) {
    if (!mask[p] || out[p]) continue;
    next++;
    out[p] = next;
    stack.push_back(p);
    while (!stack.empty()) {
      int64_t q = stack.back(); stack.pop_back();
      int y = q / w, x = q % w;
      for (int k = 0; k < nn; k++) {
        int ny = y + dy[k], nx = x + dx[k];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        int64_t r = (int64_t)ny * w + nx;
        if (mask[r] && !out[r]) { out[r] = next; stack.push_back(r); }
      }
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// Regional maxima (plateau-aware), 4- or 8-connectivity.
// A plateau is a maximum iff no neighbouring pixel is strictly greater.
// ---------------------------------------------------------------------------

void regmax2d(const float* img, int h, int w, int conn, uint8_t* out) {
  // 1-px -inf border: neighbor walks become pure index offsets with no
  // bounds checks or div/mod (border never compares greater and its cand
  // bit is pre-cleared, so plateau BFS can't enter it).
  const int64_t wp = w + 2, np = wp * (h + 2);
  std::vector<float> pimg((size_t)np, -std::numeric_limits<float>::infinity());
  std::vector<uint8_t> cand((size_t)np, 0);
  for (int y = 0; y < h; y++) {
    std::memcpy(&pimg[(size_t)(y + 1) * wp + 1], img + (size_t)y * w,
                sizeof(float) * w);
    std::memset(&cand[(size_t)(y + 1) * wp + 1], 1, w);
  }
  const int64_t off8[] = {1, -1, wp, -wp, wp + 1, -wp + 1, wp - 1, -wp - 1};
  int nn = conn == 8 ? 8 : 4;
  // BFS from every pixel that has a strictly greater neighbour: its plateau
  // (equal-valued connected set) is not a maximum.
  std::vector<int64_t> stack;
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int64_t p = (int64_t)(y + 1) * wp + x + 1;
      if (!cand[p]) continue;
      float v = pimg[p];
      bool higher = false;
      for (int k = 0; k < nn; k++)
        if (pimg[p + off8[k]] > v) { higher = true; break; }
      if (!higher) continue;
      // kill the whole plateau reachable at equal value
      cand[p] = 0;
      stack.push_back(p);
      while (!stack.empty()) {
        int64_t q = stack.back(); stack.pop_back();
        float qv = pimg[q];
        for (int k = 0; k < nn; k++) {
          int64_t r = q + off8[k];
          if (cand[r] && pimg[r] == qv) { cand[r] = 0; stack.push_back(r); }
        }
      }
    }
  }
  for (int y = 0; y < h; y++)
    std::memcpy(out + (size_t)y * w, &cand[(size_t)(y + 1) * wp + 1], w);
}

// ---------------------------------------------------------------------------
// Seeded watershed: flood from markers by increasing surface value, FIFO
// tie-break; every pixel gets a label. Matches mahotas.cwatershed exactly:
// a pixel enters the queue with ITS OWN surface value as priority (mahotas
// _morph.cpp MarkerInfo cost = array[n]) — not the flooding level
// max(surface, parent) — and is claimed by the first flood to reach it.
// The two variants differ on unseeded basins behind a pass: mahotas races
// down into them immediately, flooding-level waits at the pass height.
// ---------------------------------------------------------------------------

// Compact 16-byte queue item: the (value asc, order asc) priority packs
// into ONE uint64 — float32 bits remapped monotonically (sign-flip trick,
// both zeros collapsed to +0.0) in the high 32 bits, FIFO order in the low
// 32 (pushes are bounded by h*w < 2^32). The claiming label is not stored:
// out[pos] is already final when a pixel enters the queue. Single-word
// compares + halved item size make the heap ~3x faster than the previous
// {float, uint64, int64, int32} item with a two-field comparator; pop order
// is bit-identical.
struct PQItem {
  uint64_t key;
  int64_t pos;
};
struct PQCmp {
  bool operator()(const PQItem& a, const PQItem& b) const {
    return a.key > b.key;  // min-heap on (value, order)
  }
};

static inline uint64_t surface_key(float f, uint32_t order) {
  if (f == 0.0f) f = 0.0f;  // collapse -0.0 to +0.0 (compares equal)
  uint32_t u;
  std::memcpy(&u, &f, 4);
  u = (u & 0x80000000u) ? ~u : (u | 0x80000000u);
  return ((uint64_t)u << 32) | order;
}

// Two-level monotone bucket queue: items radix into 65536 buckets on the
// top 16 bits of the remapped float key (sign+exponent+7 mantissa bits);
// only the ACTIVE bucket is kept as a binary heap, so typical pushes/pops
// are O(1) appends instead of O(log n) sift-downs over the whole frontier.
// Floods can run DOWNHILL into unseeded basins (own-value priority), so a
// push may land in an earlier bucket than the active one; the active heap
// is then dumped back to its vector and the earlier bucket activated —
// re-heapification restores the exact (value, order) pop order, so results
// stay bit-identical to a single global heap.
void cwatershed2d(const float* surface, const int32_t* markers, int h, int w,
                  int conn, int32_t* out) {
  // Work on a 1-px-padded copy: the sentinel border (pre-claimed, label -1)
  // removes every bounds check, and neighbors become pure index offsets —
  // no per-pop pos/w, pos%w runtime divisions.
  const int64_t wp = w + 2, hp = h + 2, np = wp * hp;
  std::vector<float> psurf((size_t)np);
  std::vector<int32_t> pout((size_t)np, -1);
  for (int y = 0; y < h; y++) {
    std::memcpy(&psurf[(size_t)(y + 1) * wp + 1], surface + (size_t)y * w,
                sizeof(float) * w);
    std::fill(&pout[(size_t)(y + 1) * wp + 1],
              &pout[(size_t)(y + 1) * wp + 1 + w], 0);
  }
  const int64_t off8[] = {1, -1, wp, -wp, wp + 1, -wp + 1, wp - 1, -wp - 1};
  int nn = conn == 8 ? 8 : 4;
  const int NB = 1 << 16;
  std::vector<std::vector<PQItem>> buckets(NB);
  uint64_t nonempty[NB / 64] = {0};
  std::vector<PQItem> cur;             // min-heap (std::*_heap with PQCmp)
  int curb = NB;                       // active bucket id, NB = none
  int minb = NB;                       // lower bound on smallest vector bucket

  auto push = [&](uint64_t key, int64_t pos) {
    int b = (int)(key >> 48);
    if (b == curb) {
      cur.push_back({key, pos});
      std::push_heap(cur.begin(), cur.end(), PQCmp());
    } else {
      buckets[b].push_back({key, pos});
      nonempty[b >> 6] |= 1ull << (b & 63);
      if (b < minb) minb = b;
    }
  };

  uint32_t order = 0;
  for (int64_t p = 0; p < (int64_t)h * w; p++) {
    if (markers[p] > 0) {
      int64_t pp = (p / w + 1) * wp + (p % w) + 1;
      pout[pp] = markers[p];
      push(surface_key(psurf[pp], order++), pp);
    }
  }

  while (true) {
    // advance minb to the true smallest non-empty vector bucket
    if (minb < NB && !((nonempty[minb >> 6] >> (minb & 63)) & 1)) {
      int wd = minb >> 6;
      while (wd < NB / 64 && !nonempty[wd]) wd++;
      minb = wd < NB / 64
          ? (wd << 6) + __builtin_ctzll(nonempty[wd]) : NB;
    }
    if (minb < curb || cur.empty()) {
      if (minb == NB && cur.empty()) break;
      if (minb < NB) {
        if (!cur.empty()) {           // dump active leftovers back
          auto& bv = buckets[curb];
          bv.insert(bv.end(), cur.begin(), cur.end());
          cur.clear();
          nonempty[curb >> 6] |= 1ull << (curb & 63);
          if (curb < minb) minb = curb;
        }
        curb = minb;
        cur.swap(buckets[curb]);
        std::make_heap(cur.begin(), cur.end(), PQCmp());
        nonempty[curb >> 6] &= ~(1ull << (curb & 63));
        minb++;                       // lower bound for the next scan
        continue;
      }
    }
    std::pop_heap(cur.begin(), cur.end(), PQCmp());
    PQItem it = cur.back();
    cur.pop_back();
    int32_t label = pout[it.pos];
    for (int k = 0; k < nn; k++) {
      int64_t r = it.pos + off8[k];
      if (pout[r] == 0) {
        pout[r] = label;
        push(surface_key(psurf[r], order++), r);
      }
    }
  }
  for (int y = 0; y < h; y++)
    std::memcpy(out + (size_t)y * w, &pout[(size_t)(y + 1) * wp + 1],
                sizeof(int32_t) * w);
}

// ---------------------------------------------------------------------------
// Region-graph agglomeration (waterz semantics): edges scored by
// 1 - statistic(affinity), merged ascending until score > threshold, scores
// discretized into `bins` queue buckets (discretize_queue=256), stats merged
// on union, stale queue entries re-validated lazily.
//
// Scorer family (the reference selects these by C++ template string,
// inference_seg.py:149-153 — waterz EdgeStatisticValue providers):
//   scorer 0: mean affinity  (OneMinus<...MeanAffinityProvider...>, default)
//   scorer 1: max affinity   (MaxAffinityProvider)
//   scorer 2: min affinity   (MinAffinityProvider)
//   scorer 3: quantile(q)    (QuantileProvider<q>; affinities discretized
//             into QHB=256 histogram bins, nearest-rank on the bin centers)
// ---------------------------------------------------------------------------

static const int QHB = 256;   // quantile histogram bins (waterz discretizes)

struct EdgeStat {
  double sum = 0; uint64_t count = 0;
  float mx = -1e30f, mn = 1e30f;
  // QHB affinity bins; built for scorer 3 only. shared_ptr so the two
  // symmetric adjacency copies of an edge share ONE histogram instead of
  // duplicating ~1 KB per copy and deep-copying on every merge re-sync
  // (the symmetric copies of a pair are always written together, and
  // distinct pairs never share a pointer, so in-place += never aliases).
  std::shared_ptr<std::vector<uint32_t>> histo;
};

struct UF {
  std::vector<uint64_t> parent;
  uint64_t find(uint64_t x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  }
};

void agglomerate(const uint64_t* frags, const float* affs,
                 int z, int y, int x, float threshold, int bins,
                 int scorer, float quantile,
                 uint64_t* out) {
  const int64_t n = (int64_t)z * y * x;
  // remap fragment ids to dense
  std::unordered_map<uint64_t, uint64_t> remap;
  std::vector<uint64_t> orig;
  std::vector<uint64_t> dense(n);
  for (int64_t p = 0; p < n; p++) {
    uint64_t f = frags[p];
    auto it = remap.find(f);
    if (it == remap.end()) {
      uint64_t id = orig.size();
      remap.emplace(f, id);
      orig.push_back(f);
      dense[p] = id;
    } else dense[p] = it->second;
  }
  const uint64_t nreg = orig.size();

  // build edge stats; key = (min, max) packed
  auto pack = [](uint64_t a, uint64_t b) {
    if (a > b) std::swap(a, b);
    return (a << 32) | b;
  };
  std::unordered_map<uint64_t, EdgeStat> edges;
  edges.reserve(nreg * 4);
  const int64_t strideZ = (int64_t)y * x, strideY = x, strideX = 1;
  const int64_t chan = n;
  const int64_t strides[3] = {strideZ, strideY, strideX};
  const int dims[3] = {z, y, x};
  for (int d = 0; d < 3; d++) {
    for (int zz = 0; zz < z; zz++)
      for (int yy = 0; yy < y; yy++)
        for (int xx = 0; xx < x; xx++) {
          int c[3] = {zz, yy, xx};
          if (c[d] + 1 >= dims[d]) continue;
          int64_t p = (int64_t)zz * strideZ + yy * strideY + xx;
          int64_t q = p + strides[d];
          uint64_t a = dense[p], b = dense[q];
          if (a == b) continue;
          if (orig[a] == 0 || orig[b] == 0) continue;
          // affinity channel d at the higher-index voxel (seg_to_aff layout)
          float av = affs[d * chan + q];
          EdgeStat& e = edges[pack(a, b)];
          e.sum += av;
          e.count += 1;
          if (av > e.mx) e.mx = av;
          if (av < e.mn) e.mn = av;
          if (scorer == 3) {
            if (!e.histo)
              e.histo = std::make_shared<std::vector<uint32_t>>(QHB, 0);
            int hb = (int)(av * QHB);
            if (hb < 0) hb = 0;
            if (hb >= QHB) hb = QHB - 1;
            (*e.histo)[hb] += 1;
          }
        }
  }

  UF uf;
  uf.parent.resize(nreg);
  for (uint64_t i = 0; i < nreg; i++) uf.parent[i] = i;
  // adjacency: region -> neighbor set with stats (kept at root level)
  std::vector<std::unordered_map<uint64_t, EdgeStat>> adj(nreg);
  for (auto& kv : edges) {
    uint64_t a = kv.first >> 32, b = kv.first & 0xffffffffu;
    adj[a][b] = kv.second;
    adj[b][a] = kv.second;
  }

  auto score_of = [scorer, quantile](const EdgeStat& e) -> double {
    if (!e.count) return 1.0;
    switch (scorer) {
      case 1: return 1.0 - e.mx;
      case 2: return 1.0 - e.mn;
      case 3: {
        // nearest-rank quantile over the discretized affinity histogram:
        // the k-th smallest value, k = floor(q/100 * (count-1))
        uint64_t k = (uint64_t)((quantile / 100.0) * (double)(e.count - 1));
        uint64_t c = 0;
        for (int b = 0; b < QHB; b++) {
          c += e.histo ? (*e.histo)[b] : 0;
          if (c > k) return 1.0 - ((b + 0.5) / QHB);
        }
        return 0.0;
      }
      default: return 1.0 - e.sum / e.count;
    }
  };
  auto discretize = [bins](double s) {
    int q = (int)(s * bins);
    if (q < 0) q = 0;
    if (q >= bins) q = bins - 1;
    return q;
  };

  struct QEdge { double score; uint64_t a, b; };
  struct QCmp {
    bool operator()(const QEdge& l, const QEdge& r) const {
      return l.score > r.score;
    }
  };
  std::priority_queue<QEdge, std::vector<QEdge>, QCmp> pq;
  for (auto& kv : edges) {
    uint64_t a = kv.first >> 32, b = kv.first & 0xffffffffu;
    double s = score_of(kv.second);
    pq.push({(double)discretize(s) / bins, a, b});
  }

  while (!pq.empty()) {
    QEdge e = pq.top(); pq.pop();
    if (e.score > threshold) break;
    uint64_t ra = uf.find(e.a), rb = uf.find(e.b);
    if (ra == rb) continue;
    auto it = adj[ra].find(rb);
    if (it == adj[ra].end()) continue;
    double cur = (double)discretize(score_of(it->second)) / bins;
    if (cur > e.score + 1e-12) {  // stale: re-queue with updated score
      pq.push({cur, ra, rb});
      continue;
    }
    if (cur > threshold) continue;
    // merge smaller adjacency into larger
    if (adj[ra].size() < adj[rb].size()) std::swap(ra, rb);
    uf.parent[rb] = ra;
    adj[ra].erase(rb);
    adj[rb].erase(ra);
    for (auto& nb : adj[rb]) {
      uint64_t rc = uf.find(nb.first);
      if (rc == ra) continue;
      EdgeStat& tgt = adj[ra][rc];
      tgt.sum += nb.second.sum;
      tgt.count += nb.second.count;
      if (nb.second.mx > tgt.mx) tgt.mx = nb.second.mx;
      if (nb.second.mn < tgt.mn) tgt.mn = nb.second.mn;
      if (scorer == 3 && nb.second.histo) {
        if (!tgt.histo)
          tgt.histo = std::make_shared<std::vector<uint32_t>>(QHB, 0);
        for (int b = 0; b < QHB; b++)
          (*tgt.histo)[b] += (*nb.second.histo)[b];
      }
      adj[rc][ra] = tgt;   // keep symmetric copy in sync
      adj[rc].erase(rb);
      pq.push({(double)discretize(score_of(tgt)) / bins, ra, rc});
    }
    adj[rb].clear();
  }

  for (int64_t p = 0; p < n; p++)
    out[p] = orig[uf.find(dense[p])];
}

// ---------------------------------------------------------------------------
// MALIS maximin edge weights (em_segLib.seg_malis role, utils/malis_loss.py).
// Kruskal-style: process edges in descending affinity; when an edge merges
// two trees, it is the maximin edge for every voxel pair that spans them.
// pos=1 counts same-(nonzero)-label pairs, pos=0 counts
// different-or-background pairs. Output: per-edge pair counts.
// ---------------------------------------------------------------------------

void malis_weights(const float* affs, const uint32_t* seg,
                   int z, int y, int x, int pos, float* out) {
  const int64_t n = (int64_t)z * y * x;
  const int64_t strides[3] = {(int64_t)y * x, x, 1};
  const int dims[3] = {z, y, x};

  struct Edge { float aff; int64_t from; int8_t dir; };
  std::vector<Edge> edges;
  edges.reserve(3 * n);
  for (int d = 0; d < 3; d++)
    for (int zz = 0; zz < z; zz++)
      for (int yy = 0; yy < y; yy++)
        for (int xx = 0; xx < x; xx++) {
          int c[3] = {zz, yy, xx};
          if (c[d] + 1 >= dims[d]) continue;
          int64_t p = (int64_t)zz * strides[0] + yy * strides[1] + xx;
          // edge between p and p+stride, affinity stored at the higher voxel
          edges.push_back({affs[d * n + p + strides[d]], p, (int8_t)d});
        }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& a, const Edge& b) { return a.aff > b.aff; });

  std::vector<int64_t> parent(n);
  std::vector<int64_t> rank_(n, 0);
  for (int64_t i = 0; i < n; i++) parent[i] = i;
  std::function<int64_t(int64_t)> find = [&](int64_t v) {
    while (parent[v] != v) { parent[v] = parent[parent[v]]; v = parent[v]; }
    return v;
  };
  // per-root label histogram (label -> count); label 0 = background
  std::vector<std::unordered_map<uint32_t, int64_t>> hist(n);
  for (int64_t i = 0; i < n; i++) hist[i][seg[i]] = 1;

  std::fill(out, out + 3 * n, 0.0f);
  for (const Edge& e : edges) {
    int64_t a = find(e.from);
    int64_t b = find(e.from + strides[e.dir]);
    if (a == b) continue;
    if (hist[a].size() < hist[b].size()) std::swap(a, b);
    // count pairs this maximin edge decides
    double cnt = 0;
    if (pos) {
      for (auto& kv : hist[b]) {
        if (kv.first == 0) continue;
        auto it = hist[a].find(kv.first);
        if (it != hist[a].end()) cnt += (double)kv.second * it->second;
      }
    } else {
      int64_t tot_a = 0;
      for (auto& kv : hist[a]) tot_a += kv.second;
      for (auto& kv : hist[b]) {
        int64_t same = 0;
        if (kv.first != 0) {
          auto it = hist[a].find(kv.first);
          if (it != hist[a].end()) same = it->second;
        }
        cnt += (double)kv.second * (tot_a - same);
      }
    }
    int64_t epos = e.dir * n + e.from + strides[e.dir];
    out[epos] += (float)cnt;
    // union
    for (auto& kv : hist[b]) hist[a][kv.first] += kv.second;
    hist[b].clear();
    parent[b] = a;
  }
}

// ---------------------------------------------------------------------------
// Mutex watershed (Wolf et al., ECCV 2018): Kruskal over attractive and
// repulsive edges sorted by |weight| descending. An attractive edge merges
// two clusters unless a mutex constraint exists between them; a repulsive
// edge adds a mutex constraint. Repulsive priority = 1 - affinity.
// ---------------------------------------------------------------------------

void mutex_watershed(const float* affs, const int32_t* offsets,
                     int n_edges, int n_attractive,
                     int z, int y, int x, uint64_t* out) {
  const int64_t n = (int64_t)z * y * x;
  const int64_t sz = (int64_t)y * x, sy = x;

  struct MEdge { float w; int64_t u, v; uint8_t attractive; };
  std::vector<MEdge> edges;
  edges.reserve((size_t)n_edges * n / 2);
  for (int e = 0; e < n_edges; e++) {
    int oz = offsets[e * 3], oy = offsets[e * 3 + 1], ox = offsets[e * 3 + 2];
    bool att = e < n_attractive;
    for (int zz = 0; zz < z; zz++) {
      int z2 = zz + oz; if (z2 < 0 || z2 >= z) continue;
      for (int yy = 0; yy < y; yy++) {
        int y2 = yy + oy; if (y2 < 0 || y2 >= y) continue;
        for (int xx = 0; xx < x; xx++) {
          int x2 = xx + ox; if (x2 < 0 || x2 >= x) continue;
          int64_t p = (int64_t)zz * sz + yy * sy + xx;
          int64_t q = (int64_t)z2 * sz + y2 * sy + x2;
          float a = affs[(int64_t)e * n + p];
          // attractive edges ranked by affinity, repulsive by (1 - affinity)
          edges.push_back({att ? a : 1.0f - a, p, q, (uint8_t)att});
        }
      }
    }
  }
  std::sort(edges.begin(), edges.end(),
            [](const MEdge& a, const MEdge& b) { return a.w > b.w; });

  std::vector<int64_t> parent(n);
  for (int64_t i = 0; i < n; i++) parent[i] = i;
  std::function<int64_t(int64_t)> find = [&](int64_t v) {
    while (parent[v] != v) { parent[v] = parent[parent[v]]; v = parent[v]; }
    return v;
  };
  // mutex sets per root (sorted vectors of opposing roots)
  std::vector<std::vector<int64_t>> mutexes(n);
  auto has_mutex = [&](int64_t a, int64_t b) {
    const auto& ma = mutexes[a].size() < mutexes[b].size() ? mutexes[a]
                                                           : mutexes[b];
    int64_t other = mutexes[a].size() < mutexes[b].size() ? b : a;
    return std::binary_search(ma.begin(), ma.end(), other);
  };
  auto add_mutex = [&](int64_t a, int64_t b) {
    auto ins = [&](std::vector<int64_t>& v, int64_t t) {
      auto it = std::lower_bound(v.begin(), v.end(), t);
      if (it == v.end() || *it != t) v.insert(it, t);
    };
    ins(mutexes[a], b);
    ins(mutexes[b], a);
  };

  for (const MEdge& e : edges) {
    int64_t ra = find(e.u), rb = find(e.v);
    if (ra == rb) continue;
    if (e.attractive) {
      if (has_mutex(ra, rb)) continue;
      // merge smaller mutex set into larger
      if (mutexes[ra].size() < mutexes[rb].size()) std::swap(ra, rb);
      parent[rb] = ra;
      // migrate rb's mutexes to ra (and fix back-references lazily: we
      // store roots; stale entries resolve through find() at query time,
      // so re-canonicalise here)
      std::vector<int64_t> merged;
      merged.reserve(mutexes[ra].size() + mutexes[rb].size());
      for (int64_t m : mutexes[rb]) {
        auto it = std::lower_bound(mutexes[ra].begin(), mutexes[ra].end(), m);
        if (it == mutexes[ra].end() || *it != m) mutexes[ra].insert(it, m);
        auto& mv = mutexes[m];
        auto i2 = std::lower_bound(mv.begin(), mv.end(), rb);
        if (i2 != mv.end() && *i2 == rb) mv.erase(i2);
        auto i3 = std::lower_bound(mv.begin(), mv.end(), ra);
        if (i3 == mv.end() || *i3 != ra) mv.insert(i3, ra);
      }
      mutexes[rb].clear();
    } else {
      add_mutex(ra, rb);
    }
  }

  for (int64_t i = 0; i < n; i++) out[i] = (uint64_t)find(i) + 1;
}

}  // extern "C"
