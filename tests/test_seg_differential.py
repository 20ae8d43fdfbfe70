"""Differential tests for the C++ seg core at scale (VERDICT #4).

mahotas / waterz / skimage are not installable here, so each native routine
is checked against an independently-written brute-force Python oracle that
implements the REFERENCE semantics (mahotas flood order, waterz scoring,
skimage metric formulas) on randomized volumes, including plateau-heavy
surfaces targeting watershed tie-breaking and merge-churn agglomeration."""

import heapq

import numpy as np
import pytest
from scipy import ndimage

from gpemsr_tpu.seg import native
from gpemsr_tpu.seg.metrics import (
    adapted_rand_error, variation_of_information,
)

# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

N4 = ((1, 0), (-1, 0), (0, 1), (0, -1))


def oracle_cwatershed(surface, markers):
    """mahotas.cwatershed: heap keyed (own surface value, insertion order),
    claim at push (equivalent to claim-at-pop under FIFO ties)."""
    h, w = surface.shape
    out = markers.astype(np.int64).copy()
    heap = []
    order = 0
    for p in np.argwhere(markers > 0):
        y, x = int(p[0]), int(p[1])
        heapq.heappush(heap, (float(surface[y, x]), order, y, x))
        order += 1
    while heap:
        _, _, y, x = heapq.heappop(heap)
        for dy, dx in N4:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and out[ny, nx] == 0:
                out[ny, nx] = out[y, x]
                heapq.heappush(heap, (float(surface[ny, nx]), order, ny, nx))
                order += 1
    return out


def oracle_regmax(img):
    """Plateau-aware regional maxima via union-find over equal-value
    4-neighbour zones (independent of the C++ BFS-kill algorithm)."""
    h, w = img.shape
    parent = np.arange(h * w)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for y in range(h):
        for x in range(w):
            p = y * w + x
            if x + 1 < w and img[y, x] == img[y, x + 1]:
                parent[find(p)] = find(p + 1)
            if y + 1 < h and img[y, x] == img[y + 1, x]:
                parent[find(p)] = find(p + w)
    has_greater = np.zeros(h * w, bool)
    for y in range(h):
        for x in range(w):
            for dy, dx in N4:
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and img[ny, nx] > img[y, x]:
                    has_greater[find(y * w + x)] = True
    return np.array([[not has_greater[find(y * w + x)] for x in range(w)]
                     for y in range(h)])


def _entropies(a, b):
    """Dense-contingency H(A), H(B), H(A,B) in bits (skimage's _xlogx is
    x*log2(x)) over ALL voxels."""
    a = a.ravel().astype(np.int64)
    b = b.ravel().astype(np.int64)
    n = a.size
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    cont = np.zeros((ua.size, ub.size))
    np.add.at(cont, (ia, ib), 1.0)
    p = cont / n
    pa = p.sum(1)
    pb = p.sum(0)

    def H(q):
        q = q[q > 0]
        return float(-(q * np.log2(q)).sum())

    return H(pa), H(pb), H(p.ravel()), cont


def oracle_voi(gt, seg, ignore_gt_zero=True):
    """skimage variation_of_information(ignore_labels=[0]) formulation:
    drop voxels whose gt label is ignored, then
    (H(seg|gt), H(gt|seg)) = (Hab - Ha, Hab - Hb)."""
    if ignore_gt_zero:
        m = gt.ravel() != 0
        gt, seg = gt.ravel()[m], seg.ravel()[m]
    Ha, Hb, Hab, _ = _entropies(gt, seg)
    return Hab - Ha, Hab - Hb


def oracle_arand(gt, seg, ignore_gt_zero=True):
    """skimage adapted_rand_error: are = 1 - 2pr/(p+r) with
    p = sum nij^2 / sum b_j^2, r = sum nij^2 / sum a_i^2 (a=gt rows)."""
    if ignore_gt_zero:
        m = gt.ravel() != 0
        gt, seg = gt.ravel()[m], seg.ravel()[m]
    _, _, _, cont = _entropies(gt, seg)
    sum2 = (cont ** 2).sum()
    prec = sum2 / (cont.sum(0) ** 2).sum()
    rec = sum2 / (cont.sum(1) ** 2).sum()
    return 1.0 - 2 * prec * rec / (prec + rec)


def oracle_agglomerate(frags, affs, threshold, bins, scorer="mean", q=50.0):
    """Eager waterz-semantics oracle: recompute every discretized score each
    round, merge the global minimum until it exceeds threshold. Mirrors the
    same discretization; with huge `bins` ties are measure-zero (for the
    continuous scorers) and the result must match the lazy-requeue C++
    exactly. Scorers mirror the C++ family: 'mean', 'max', 'min',
    'quantile' (nearest-rank over 256-bin discretized affinities)."""
    z, y, x = frags.shape
    stats = {}     # (a, b) -> list of edge affinities
    for d, stride in ((0, (1, 0, 0)), (1, (0, 1, 0)), (2, (0, 0, 1))):
        a = frags[:z - stride[0] or None, :y - stride[1] or None,
                  :x - stride[2] or None]
        b = frags[stride[0]:, stride[1]:, stride[2]:]
        av = affs[d][stride[0]:, stride[1]:, stride[2]:]
        for fa, fb, v in zip(a.ravel(), b.ravel(), av.ravel()):
            if fa == fb or fa == 0 or fb == 0:
                continue
            k = (min(fa, fb), max(fa, fb))
            stats.setdefault(k, []).append(float(v))

    parent = {int(f): int(f) for f in np.unique(frags)}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def disc(s):
        qq = int(s * bins)
        return min(max(qq, 0), bins - 1) / bins

    def score(vals):
        if scorer == "max":
            return 1.0 - max(vals)
        if scorer == "min":
            return 1.0 - min(vals)
        if scorer == "quantile":
            QHB = 256
            dv = sorted(min(max(int(v * QHB), 0), QHB - 1) for v in vals)
            k = int((q / 100.0) * (len(dv) - 1))
            return 1.0 - (dv[k] + 0.5) / QHB
        return 1.0 - sum(vals) / len(vals)

    while True:
        # canonicalize
        canon = {}
        for (a, b), vals in stats.items():
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            k = (min(ra, rb), max(ra, rb))
            canon.setdefault(k, []).extend(vals)
        stats = canon
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: disc(score(kv[1])))
        s = disc(score(best[1]))
        if s > threshold:
            break
        a, b = best[0]
        parent[b] = a
    return np.vectorize(lambda f: find(int(f)) if f else 0)(frags)


def oracle_mutex(affs, offsets, n_attractive):
    """Mutex watershed Kruskal oracle with dict-of-sets constraints."""
    ne = len(offsets)
    z, y, x = affs.shape[1:]
    edges = []
    for e in range(ne):
        oz, oy, ox = offsets[e]
        att = e < n_attractive
        for zz in range(z):
            if not 0 <= zz + oz < z:
                continue
            for yy in range(y):
                if not 0 <= yy + oy < y:
                    continue
                for xx in range(x):
                    if not 0 <= xx + ox < x:
                        continue
                    p = (zz * y + yy) * x + xx
                    q = ((zz + oz) * y + yy + oy) * x + xx + ox
                    a = float(affs[e, zz, yy, xx])
                    edges.append((a if att else 1.0 - a, p, q, att))
    edges.sort(key=lambda t: -t[0])
    parent = list(range(z * y * x))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    mut = {}
    for w, p, q, att in edges:
        ra, rb = find(p), find(q)
        if ra == rb:
            continue
        if att:
            if rb in mut.get(ra, ()):
                continue
            parent[rb] = ra
            mb = mut.pop(rb, set())
            ma = mut.setdefault(ra, set())
            for m in mb:
                ma.add(m)
                s = mut.setdefault(m, set())
                s.discard(rb)
                s.add(ra)
        else:
            mut.setdefault(ra, set()).add(rb)
            mut.setdefault(rb, set()).add(ra)
    return np.array([find(i) for i in range(z * y * x)]).reshape(z, y, x)


def perm_equal(a, b):
    """Label volumes equal up to bijective relabeling."""
    a = a.ravel()
    b = b.ravel()
    pairs = set(zip(a.tolist(), b.tolist()))
    return (len(pairs) == len(set(a.tolist()))
            and len(pairs) == len(set(b.tolist())))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_cwatershed_random_and_plateau(rng):
    for trial in range(30):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        surface = rng.uniform(0, 1, (h, w)).astype(np.float32)
        if trial % 2:
            surface = np.round(surface * 4) / 4  # heavy plateaus / ties
        markers = np.zeros((h, w), np.int32)
        for i in range(int(rng.integers(2, 8))):
            markers[rng.integers(0, h), rng.integers(0, w)] = i + 1
        got = native.cwatershed2d(surface, markers)
        want = oracle_cwatershed(surface, markers)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_regmax_random_and_plateau(rng):
    for trial in range(20):
        h, w = int(rng.integers(6, 30)), int(rng.integers(6, 30))
        img = rng.uniform(0, 1, (h, w)).astype(np.float32)
        if trial % 2:
            img = np.round(img * 3) / 3
        got = native.regmax2d(img)
        want = oracle_regmax(img)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_edt_random_vs_scipy(rng):
    for _ in range(10):
        h, w = int(rng.integers(10, 60)), int(rng.integers(10, 60))
        mask = rng.uniform(0, 1, (h, w)) > 0.4
        if not (~mask).any():
            mask[0, 0] = False
        got = native.edt2d_sq(mask)
        want = ndimage.distance_transform_edt(mask) ** 2
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_voi_arand_property_random(rng):
    for _ in range(100):
        shape = tuple(int(rng.integers(4, 12)) for _ in range(3))
        gt = rng.integers(0, 6, shape).astype(np.uint64)
        seg = rng.integers(1, 5, shape).astype(np.uint64)
        vs, vm = variation_of_information(gt, seg)
        ovs, ovm = oracle_voi(gt, seg)
        assert abs(vs - ovs) < 1e-8 and abs(vm - ovm) < 1e-8
        are, _, _ = adapted_rand_error(gt, seg)
        assert abs(are - oracle_arand(gt, seg)) < 1e-8


def _random_fragments(rng, shape, n):
    """Voronoi-ish random fragments with ids >= 1 (plus some background 0)."""
    pts = np.stack([rng.integers(0, s, n) for s in shape], 1)
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                indexing="ij"), -1)
    d = ((grid[..., None, :] - pts[None, None, None]) ** 2).sum(-1)
    frags = d.argmin(-1).astype(np.uint64) + 1
    frags[rng.uniform(size=shape) < 0.02] = 0
    return frags


def test_agglomerate_exact_vs_eager_oracle(rng):
    """Continuous scores (huge bins): the lazy-requeue C++ must match an
    eager-recompute oracle label-for-label, under heavy merge churn."""
    for trial in range(8):
        shape = (3, 14, 14)
        frags = _random_fragments(rng, shape, int(rng.integers(8, 20)))
        affs = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
        thr = [0.3, 0.5, 0.7, 0.95][trial % 4]
        got = native.agglomerate(frags, affs, threshold=thr, bins=10 ** 7)
        want = oracle_agglomerate(frags, affs, thr, 10 ** 7)
        assert perm_equal(got, want), f"trial {trial} thr {thr}"
        # background stays untouched
        np.testing.assert_array_equal(got == 0, frags == 0)


def test_agglomerate_scorer_family_vs_oracle(rng):
    """waterz scorer family (inference_seg.py:149-153 template surface):
    max/min are continuous — exact label match with huge bins; quantile is
    256-bin discretized (tie order inside a bin is implementation-defined) —
    require metric-level agreement."""
    for trial in range(4):
        shape = (3, 12, 12)
        frags = _random_fragments(rng, shape, int(rng.integers(8, 16)))
        affs = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
        thr = [0.3, 0.5, 0.7, 0.9][trial]
        for sf, oscorer in (("max", "max"), ("min", "min")):
            got = native.agglomerate(frags, affs, threshold=thr, bins=10 ** 7,
                                     scoring_function=sf)
            want = oracle_agglomerate(frags, affs, thr, 10 ** 7,
                                      scorer=oscorer)
            assert perm_equal(got, want), f"{sf} trial {trial} thr {thr}"
        for qq in (25.0, 50.0, 75.0):
            got = native.agglomerate(frags, affs, threshold=thr, bins=10 ** 7,
                                     scoring_function=f"quantile:{qq:.0f}")
            want = oracle_agglomerate(frags, affs, thr, 10 ** 7,
                                      scorer="quantile", q=qq)
            vs, vm = variation_of_information(want.astype(np.uint64),
                                              got.astype(np.uint64))
            assert vs + vm < 0.25, (qq, trial, vs, vm)


def test_agglomerate_binned_voi_close(rng):
    """With waterz's production discretization (256 bins) tie order inside a
    bin is implementation-defined; require metric-level agreement."""
    shape = (3, 16, 16)
    frags = _random_fragments(rng, shape, 16)
    affs = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
    got = native.agglomerate(frags, affs, threshold=0.5, bins=256)
    want = oracle_agglomerate(frags, affs, 0.5, 256)
    vs, vm = variation_of_information(want.astype(np.uint64),
                                      got.astype(np.uint64))
    assert vs + vm < 0.2, (vs, vm)


def test_mutex_watershed_vs_oracle(rng):
    from gpemsr_tpu.seg.mutex import mutex_watershed

    offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0),
               (0, 0, 4), (0, 4, 0), (1, 2, 2)]
    n_att = 3
    for trial in range(5):
        shape = (3, 10, 10)
        affs = rng.uniform(0, 1, (len(offsets),) + shape).astype(np.float32)
        got = mutex_watershed(affs, offsets, n_att)
        want = oracle_mutex(affs, offsets, n_att)
        assert perm_equal(got, want), f"trial {trial}"


def _maximin_oracle(affs, seg, pos):
    """Brute-force MALIS: maximum spanning tree by Kruskal; when an edge
    joins two trees it decides exactly the pairs spanning them (identical
    statement of the algorithm, but implemented over explicit python sets —
    O(n^2) — rather than histograms)."""
    z, y, x = seg.shape
    n = z * y * x
    edges = []
    strides = (y * x, x, 1)
    for d in range(3):
        for zz in range(z):
            for yy in range(y):
                for xx in range(x):
                    c = (zz, yy, xx)
                    if c[d] + 1 >= (z, y, x)[d]:
                        continue
                    p = (zz * y + yy) * x + xx
                    q = p + strides[d]
                    edges.append((float(affs[d].ravel()[q]), d, p, q))
    edges.sort(key=lambda t: -t[0])
    comp = {i: {i} for i in range(n)}
    where = list(range(n))
    out = np.zeros_like(affs)
    lab = seg.ravel()
    for a, d, p, q in edges:
        cp, cq = where[p], where[q]
        if cp == cq:
            continue
        A, B = comp[cp], comp[cq]
        cnt = 0
        for u in A:
            for v in B:
                same = lab[u] == lab[v] and lab[u] != 0
                if (pos and same) or (not pos and not same):
                    cnt += 1
        out[d].ravel()[q] += cnt
        A |= B
        for v in B:
            where[v] = cp
        del comp[cq]
    return out


def test_malis_vs_bruteforce(rng):
    for trial in range(4):
        shape = (2, 4, 4)
        affs = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
        seg = rng.integers(0, 4, shape).astype(np.uint32)
        for pos in (True, False):
            got = native.malis_weights(affs, seg, pos)
            want = _maximin_oracle(affs, seg, pos)
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"trial {trial} pos {pos}")
