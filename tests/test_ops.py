"""Golden tests for core TPU ops against torch (CPU) oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gpemsr_tpu.ops import (
    resize_bilinear, interpolate, flow_warp, pixel_shuffle, pixel_unshuffle,
    extract_patches, deform_conv2d, torch_weight_to_dcn, quantize, lookup_logits,
    contextual_loss,
)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("scale", [4.0, 2.0, 0.5, 0.25])
def test_resize_bilinear_matches_torch(rng, align, scale):
    x = rng.standard_normal((2, 16, 12, 3), dtype=np.float32)
    out = interpolate(jnp.asarray(x), scale, align_corners=align)
    ref = F.interpolate(nchw(x), scale_factor=scale, mode="bilinear",
                        align_corners=align)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_resize_bilinear_odd_sizes(rng):
    x = rng.standard_normal((1, 7, 9, 2), dtype=np.float32)
    out = resize_bilinear(jnp.asarray(x), 13, 5, align_corners=False)
    ref = F.interpolate(nchw(x), size=(13, 5), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_flow_warp_matches_grid_sample(rng, padding_mode):
    B, H, W, C = 2, 8, 10, 4
    x = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * 3).astype(np.float32)

    out = flow_warp(jnp.asarray(x), jnp.asarray(flow), padding_mode=padding_mode)

    # torch oracle: build normalized grid like basicsr flow_warp
    ty, tx = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    grid = torch.stack((tx, ty), 2).float()[None].expand(B, -1, -1, -1)
    vgrid = grid + torch.from_numpy(flow)
    vx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    ref = F.grid_sample(nchw(x), torch.stack((vx, vy), dim=3), mode="bilinear",
                        padding_mode=padding_mode, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 5, 12), dtype=np.float32)
    out = pixel_shuffle(jnp.asarray(x), 2)
    ref = F.pixel_shuffle(nchw(x), 2)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=0)
    back = pixel_unshuffle(out, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_extract_patches_matches_unfold(rng):
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    out = extract_patches(jnp.asarray(x), ksize=(16, 16), stride=(16, 16))
    ref = F.unfold(nchw(x), kernel_size=16, stride=16)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_extract_patches_same_padding(rng):
    # non-divisible size exercises the reflect same-padding path
    x = rng.standard_normal((1, 20, 20, 2), dtype=np.float32)
    out = extract_patches(jnp.asarray(x), ksize=(16, 16), stride=(16, 16))
    # reference same_padding: pad_total = 12, top/left = 6 (GPEMSR.py:21-28)
    xp = F.pad(nchw(x), (6, 6, 6, 6), mode="reflect")
    ref = F.unfold(xp, kernel_size=16, stride=16)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def _torch_deform_conv2d(x, offset, mask, weight, bias, pad=1, groups=8):
    """Reference modulated deformable conv via explicit per-tap grid_sample.

    Oracle implementation (torchvision is unavailable); follows the DCNv2
    definition directly."""
    B, C, H, W = x.shape
    Co, Ci, kh, kw = weight.shape
    K = kh * kw
    G = groups
    Cg = C // G
    off = offset.reshape(B, G, K, 2, H, W)
    msk = mask.reshape(B, G, K, H, W)
    ys, xs = torch.meshgrid(torch.arange(H).float(), torch.arange(W).float(),
                            indexing="ij")
    cols = []
    for k in range(K):
        ki, kj = divmod(k, kw)
        taps = []
        for g in range(G):
            py = ys + (ki - pad) + off[:, g, k, 0]
            px = xs + (kj - pad) + off[:, g, k, 1]
            gx = 2.0 * px / max(W - 1, 1) - 1.0
            gy = 2.0 * py / max(H - 1, 1) - 1.0
            grid = torch.stack((gx, gy), dim=-1)
            samp = F.grid_sample(x[:, g * Cg:(g + 1) * Cg], grid, mode="bilinear",
                                 padding_mode="zeros", align_corners=True)
            taps.append(samp * msk[:, g, k:k + 1])
        cols.append(torch.cat(taps, dim=1))           # [B, C, H, W] per tap
    col = torch.stack(cols, dim=1)                    # [B, K, C, H, W]
    col = col.permute(0, 3, 4, 1, 2).reshape(B, H * W, K * Ci)
    w = weight.permute(0, 2, 3, 1).reshape(Co, K * Ci)   # (k, ci) ordering
    out = col @ w.t() + bias
    return out.reshape(B, H, W, Co).permute(0, 3, 1, 2)


def test_deform_conv2d_matches_reference(rng):
    B, H, W, C, G = 1, 6, 6, 16, 4
    K = 9
    x = rng.standard_normal((B, H, W, C), dtype=np.float32)
    offset = (rng.standard_normal((B, H, W, 2 * G * K)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G * K)).astype(np.float32)
    w = (rng.standard_normal((C, C, 3, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)

    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                        torch_weight_to_dcn(w), jnp.asarray(b),
                        deformable_groups=G)

    ref = _torch_deform_conv2d(nchw(x), nchw(offset), nchw(mask),
                               torch.from_numpy(w), torch.from_numpy(b), groups=G)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=2e-4)


def test_deform_conv_zero_offset_is_conv(rng):
    """With zero offsets and unit mask, DCN must equal a plain 3x3 conv."""
    B, H, W, C = 2, 8, 8, 8
    x = rng.standard_normal((B, H, W, C), dtype=np.float32)
    w = (rng.standard_normal((C, C, 3, 3)) * 0.1).astype(np.float32)
    offset = np.zeros((B, H, W, 2 * 8 * 9), np.float32)
    mask = np.ones((B, H, W, 8 * 9), np.float32)
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                        torch_weight_to_dcn(w), None, deformable_groups=8)
    ref = F.conv2d(nchw(x), torch.from_numpy(w), padding=1)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-4)


def test_quantize_straight_through(rng):
    import jax
    cb = rng.standard_normal((32, 8), dtype=np.float32)
    z = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    z_q, idx, loss = quantize(jnp.asarray(z), jnp.asarray(cb), beta=1.0)
    # indices are true nearest neighbours
    d = ((z.reshape(-1, 1, 8) - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    # straight-through: dL/dz of sum(z_q) is all-ones
    g = jax.grad(lambda zz: jnp.sum(quantize(zz, jnp.asarray(cb), 1.0)[0]))(
        jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z))


def test_lookup_logits(rng):
    cb = rng.standard_normal((16, 4), dtype=np.float32)
    logits = rng.standard_normal((1, 3, 3, 16), dtype=np.float32)
    out = lookup_logits(jnp.asarray(logits), jnp.asarray(cb))
    np.testing.assert_allclose(np.asarray(out), cb[logits.argmax(-1)])


def test_lookup_logits_rejects_mismatched_codebook(rng):
    """num_classes != codebook size would silently NaN-fill via the
    out-of-range take — must fail loudly instead."""
    cb = rng.standard_normal((16, 4), dtype=np.float32)
    logits = rng.standard_normal((1, 3, 3, 32), dtype=np.float32)
    with pytest.raises(ValueError, match="num_classes"):
        lookup_logits(jnp.asarray(logits), jnp.asarray(cb))


def test_contextual_loss_matches_torch(rng):
    x = rng.standard_normal((2, 8, 6, 6), dtype=np.float32)
    y = rng.standard_normal((2, 8, 6, 6), dtype=np.float32)
    out = contextual_loss(jnp.asarray(x), jnp.asarray(y), band_width=0.5)

    # torch oracle (cosine CX loss as defined in the CX paper)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    y_mu = ty.mean(dim=(0, 2, 3), keepdim=True)
    xc, yc = tx - y_mu, ty - y_mu
    xn = F.normalize(xc, p=2, dim=1).reshape(2, 8, -1)
    yn = F.normalize(yc, p=2, dim=1).reshape(2, 8, -1)
    dist = torch.clamp(1 - torch.bmm(xn.transpose(1, 2), yn), min=0)
    dmin = dist.min(dim=2, keepdim=True)[0]
    dt = dist / (dmin + 1e-5)
    w = torch.exp((1 - dt) / 0.5)
    cx = w / (w.sum(dim=2, keepdim=True) + 1e-5)
    rm, ra = cx.max(dim=1, keepdim=True)
    c = torch.gather(torch.exp((1 - dist) / 0.5), 1, ra)
    val = (rm * c).squeeze(1).sum(1) / c.squeeze(1).sum(1)
    ref = (-torch.log(val + 1e-5)).mean()
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5)


def _torch_cx_dist(tx, ty, loss_type):
    """Torch oracle for the reference's distance matrices, including its two
    quirks (L2 broadcasts y-norms over the wrong axis; L1 ignores y)."""
    N, C = tx.shape[:2]
    if loss_type == "cosine":
        y_mu = ty.mean(dim=(0, 2, 3), keepdim=True)
        xn = F.normalize(tx - y_mu, p=2, dim=1).reshape(N, C, -1)
        yn = F.normalize(ty - y_mu, p=2, dim=1).reshape(N, C, -1)
        return torch.clamp(1 - torch.bmm(xn.transpose(1, 2), yn), min=0)
    if loss_type == "L2":
        xv, yv = tx.reshape(N, C, -1), ty.reshape(N, C, -1)
        x_s = (xv ** 2).sum(dim=1, keepdim=True)
        y_s = (yv ** 2).sum(dim=1, keepdim=True)
        a = yv.transpose(1, 2) @ xv
        return (y_s - 2 * a + x_s).transpose(1, 2).clamp(min=0)
    # 'L1': channel-sums of x against themselves
    s = tx.reshape(N, C, -1).sum(dim=1)
    return (s[:, None, :] - s[:, :, None]).abs().clamp(min=0)


def _torch_cx_from_dist(dist, band_width=0.5):
    dmin = dist.min(dim=2, keepdim=True)[0]
    w = torch.exp((1 - dist / (dmin + 1e-5)) / band_width)
    return w / (w.sum(dim=2, keepdim=True) + 1e-5)


def _torch_cx_tail(cx, dist, band_width=0.5):
    rm, ra = cx.max(dim=1, keepdim=True)
    c = torch.gather(torch.exp((1 - dist) / band_width), 1, ra)
    val = (rm * c).squeeze(1).sum(1) / c.squeeze(1).sum(1)
    return (-torch.log(val + 1e-5)).mean()


@pytest.mark.parametrize("loss_type", ["L1", "L2"])
def test_contextual_loss_variants_match_torch(rng, loss_type):
    from gpemsr_tpu.ops.contextual import contextual_loss as cx_loss
    x = rng.standard_normal((2, 8, 6, 6), dtype=np.float32)
    y = rng.standard_normal((2, 8, 6, 6), dtype=np.float32)
    out = cx_loss(jnp.asarray(x), jnp.asarray(y), loss_type=loss_type)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    dist = _torch_cx_dist(tx, ty, loss_type)
    ref = _torch_cx_tail(_torch_cx_from_dist(dist), dist)
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5)


@pytest.mark.parametrize("loss_type", ["cosine", "L2"])
def test_contextual_bilateral_matches_torch(rng, loss_type):
    from gpemsr_tpu.ops.contextual import contextual_bilateral_loss
    N, C, H, W = 2, 8, 5, 7
    x = rng.standard_normal((N, C, H, W), dtype=np.float32)
    y = rng.standard_normal((N, C, H, W), dtype=np.float32)
    out = contextual_bilateral_loss(jnp.asarray(x), jnp.asarray(y),
                                    weight_sp=0.1, loss_type=loss_type)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    rows = torch.arange(H, dtype=torch.float32) / (H + 1)
    cols = torch.arange(W, dtype=torch.float32) / (W + 1)
    g = torch.stack(torch.meshgrid(rows, cols, indexing="ij")).unsqueeze(0)
    grid = torch.cat([g for _ in range(N)], dim=0)
    dist_sp = _torch_cx_dist(grid, grid, "L2")
    cx_sp = _torch_cx_from_dist(dist_sp)
    dist = _torch_cx_dist(tx, ty, loss_type)
    cx_feat = _torch_cx_from_dist(dist)
    ref = _torch_cx_tail(0.9 * cx_feat + 0.1 * cx_sp, dist)
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5)


def test_deform_conv_dense_equals_gather(rng):
    """The dense one-hot path (training-size maps) must match the gather path."""
    B, H, W, C, G = 2, 6, 6, 16, 4
    K = 9
    x = rng.standard_normal((B, H, W, C), dtype=np.float32)
    offset = (rng.standard_normal((B, H, W, 2 * G * K)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G * K)).astype(np.float32)
    w = (rng.standard_normal((C, C, 3, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            torch_weight_to_dcn(w), jnp.asarray(b))
    dense = deform_conv2d(*args, deformable_groups=G, dense_threshold=1024)
    gathered = deform_conv2d(*args, deformable_groups=G, dense_threshold=0)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gathered),
                               atol=2e-4)


def test_flow_warp_windowed_matches_gather(rng):
    """Pallas windowed warp (interpret mode) == slab-gather border warp,
    including the guard fallback for out-of-window flows."""
    from gpemsr_tpu.ops import warp_pallas
    from gpemsr_tpu.ops.warp_pallas import flow_warp_windowed, warp_window_ok

    B, H, W, C = 2, 16, 128, 3
    x = rng.standard_normal((B, H, W, C), dtype=np.float32)

    old = warp_pallas.INTERPRET
    warp_pallas.INTERPRET = True
    try:
        # in-window flows -> kernel path, must match the gather formulation
        flow = np.clip(rng.standard_normal((B, H, W, 2)) * 2.5,
                       -6, 6).astype(np.float32)
        assert bool(warp_window_ok(jnp.asarray(flow), H, W, 8))
        out = flow_warp_windowed(jnp.asarray(x), jnp.asarray(flow), radius=8)
        ref = flow_warp(jnp.asarray(x), jnp.asarray(flow),
                        padding_mode="border")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        # border-clamped corners (flow pushing past edges) stay exact as
        # long as the clamped displacement fits the window
        flow_edge = np.zeros((B, H, W, 2), np.float32)
        flow_edge[..., 0] = 3.7
        flow_edge[..., 1] = -2.2
        out = flow_warp_windowed(jnp.asarray(x), jnp.asarray(flow_edge),
                                 radius=8)
        ref = flow_warp(jnp.asarray(x), jnp.asarray(flow_edge),
                        padding_mode="border")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        # out-of-window flow -> guard falls back to the gather path exactly
        flow_big = flow.copy()
        flow_big[0, H // 2, 5, 0] = 40.0
        assert not bool(warp_window_ok(jnp.asarray(flow_big), H, W, 8))
        out = flow_warp_windowed(jnp.asarray(x), jnp.asarray(flow_big),
                                 radius=8)
        ref = flow_warp(jnp.asarray(x), jnp.asarray(flow_big),
                        padding_mode="border")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
    finally:
        warp_pallas.INTERPRET = old


def test_spynet_flow_warp_routing(rng):
    """spynet_flow_warp == flow_warp(border) for both lane-aligned and
    unaligned shapes (the latter routes to the gather path)."""
    from gpemsr_tpu.ops.warp_pallas import spynet_flow_warp

    for (H, W) in ((16, 128), (8, 10)):
        x = rng.standard_normal((2, H, W, 3), dtype=np.float32)
        flow = (rng.standard_normal((2, H, W, 2)) * 2).astype(np.float32)
        out = spynet_flow_warp(jnp.asarray(x), jnp.asarray(flow))
        ref = flow_warp(jnp.asarray(x), jnp.asarray(flow),
                        padding_mode="border")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_dcn_gather_chunked_matches_unchunked(rng):
    """Whole-row chunking of the slab-gather path (HBM-padding guard) is a
    pure memory reshape — outputs must be identical."""
    from gpemsr_tpu.ops import dcn as dcn_mod

    B, H, W, Cin, G = 2, 8, 8, 16, 4
    K = 9
    x = rng.standard_normal((B, H, W, Cin), dtype=np.float32)
    off = (rng.standard_normal((B, H, W, 2 * G * K)) * 2).astype(np.float32)
    mask = 1 / (1 + np.exp(-rng.standard_normal((B, H, W, G * K))
                           .astype(np.float32)))
    w = (rng.standard_normal((K, Cin, 8)) * 0.1).astype(np.float32)
    args = [jnp.asarray(t) for t in (x, off, mask, w)]

    ref = deform_conv2d(*args, deformable_groups=G, dense_threshold=0)
    old = dcn_mod._CHUNK_BUDGET_MB
    dcn_mod._CHUNK_BUDGET_MB = 0          # force maximal chunking
    try:
        chunked = deform_conv2d(*args, deformable_groups=G, dense_threshold=0)
    finally:
        dcn_mod._CHUNK_BUDGET_MB = old
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               atol=1e-6)


@pytest.mark.parametrize("dtype,B", [("float32", 2), ("bfloat16", 2),
                                     ("float32", 1), ("float32", 3)])
def test_vgg_patch_cosine_kernel_matches_xla(rng, dtype, B):
    """Fused Pallas patch-cosine (interpret mode) == the unfused
    conv/conv/pool formulation used off-TPU. B=1/3 exercise the
    folded-lane image indexing (images live in the lane axis)."""
    import flax.linen as nn
    import jax
    from jax import lax

    from gpemsr_tpu.ops import vggmask_pallas
    from gpemsr_tpu.ops.vggmask_pallas import vgg_patch_cosine

    H, W, C = 32, 128, 64
    img_a = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    img_b = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    k1 = (rng.standard_normal((3, 3, 3, C)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((C,)) * 0.1).astype(np.float32)
    k2 = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    b2 = (rng.standard_normal((C,)) * 0.1).astype(np.float32)

    def relu12(x):
        x3 = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        h = lax.conv_general_dilated(
            x3, jnp.asarray(k1), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b1)
        h = lax.conv_general_dilated(
            h, jnp.asarray(k2), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(h + b2)

    def patch_sums(t):
        return jnp.sum(nn.avg_pool(t, (16, 16), strides=(16, 16)),
                       axis=-1) * 256.0

    va, vb = relu12(jnp.asarray(img_a)), relu12(jnp.asarray(img_b))
    sim_ref = patch_sums(va * vb) / (
        jnp.sqrt(patch_sums(va * va)) * jnp.sqrt(patch_sums(vb * vb)) + 1e-12)

    dt = jnp.dtype(dtype)
    old = vggmask_pallas.INTERPRET
    vggmask_pallas.INTERPRET = True
    try:
        sim = vgg_patch_cosine(jnp.asarray(img_a).astype(dt),
                               jnp.asarray(img_b).astype(dt),
                               jnp.asarray(k1).astype(dt),
                               jnp.asarray(b1).astype(dt),
                               jnp.asarray(k2).astype(dt),
                               jnp.asarray(b2).astype(dt))
    finally:
        vggmask_pallas.INTERPRET = old
    np.testing.assert_allclose(np.asarray(sim), np.asarray(sim_ref),
                               atol=2e-4 if dtype == "float32" else 5e-2)


def test_subpixel_conv_shuffle_matches_conv_pixel_shuffle(rng):
    """SubpixelConvShuffle must be bit-compatible with the torch-order
    Conv -> pixel_shuffle it replaces, sharing the same checkpoint layout."""
    import jax
    from gpemsr_tpu.models.layers import Conv, SubpixelConvShuffle

    x = jnp.asarray(rng.standard_normal((2, 6, 7, 5), dtype=np.float32))
    mod = SubpixelConvShuffle(16)                     # C=4, r=2
    params = mod.init(jax.random.PRNGKey(0), x)
    assert set(params["params"]["conv"]) == {"kernel", "bias"}
    ref = pixel_shuffle(Conv(16).apply(params, x), 2)
    out = mod.apply(params, x)
    assert out.shape == (2, 12, 14, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # bf16 inputs promote exactly like flax Conv (common dtype with params)
    out_bf = mod.apply(params, x.astype(jnp.bfloat16))
    ref_bf = pixel_shuffle(Conv(16).apply(params, x.astype(jnp.bfloat16)), 2)
    assert out_bf.dtype == ref_bf.dtype
    np.testing.assert_allclose(np.asarray(out_bf, dtype=np.float32),
                               np.asarray(ref_bf, dtype=np.float32), atol=1e-5)
