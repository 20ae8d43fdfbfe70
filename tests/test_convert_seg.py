"""Seg-model weight-conversion golden tests (reference .pt key layouts)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpemsr_tpu.models import convert as cv


def test_mala_conversion(rng):
    """Full MALA oracle in torch (valid convs, grouped stride-3 transpose up,
    crop-add) vs our UNetMALA with converted weights."""
    from gpemsr_tpu.models.seg.mala import UNetMALA

    torch.manual_seed(0)

    class TMala(nn.Module):
        def __init__(s):
            super().__init__()
            ch = [(1, 12), (12, 12), (12, 60), (60, 60), (60, 300), (300, 300),
                  (300, 1500), (1500, 1500)]
            # use tiny channel counts for test speed
            ch = [(1, 4), (4, 4), (4, 6), (6, 6), (6, 8), (8, 8), (8, 10), (10, 10)]
            for i, (a, b) in enumerate(ch, start=1):
                setattr(s, f"conv{i}", nn.Conv3d(a, b, 3))
            s.dconv1 = nn.ConvTranspose3d(10, 10, (1, 3, 3), (1, 3, 3),
                                          groups=10, bias=False)
            s.conv9 = nn.Conv3d(10, 8, 1)
            s.conv10 = nn.Conv3d(8, 8, 3)
            s.conv11 = nn.Conv3d(8, 8, 3)
            s.dconv2 = nn.ConvTranspose3d(8, 8, (1, 3, 3), (1, 3, 3),
                                          groups=8, bias=False)
            s.conv12 = nn.Conv3d(8, 6, 1)
            s.conv13 = nn.Conv3d(6, 6, 3)
            s.conv14 = nn.Conv3d(6, 6, 3)
            s.dconv3 = nn.ConvTranspose3d(6, 6, (1, 3, 3), (1, 3, 3),
                                          groups=6, bias=False)
            s.conv15 = nn.Conv3d(6, 4, 1)
            s.conv16 = nn.Conv3d(4, 4, 3)
            s.conv17 = nn.Conv3d(4, 4, 3)
            s.conv18 = nn.Conv3d(4, 3, 1)

        @staticmethod
        def crop_add(up, skip):
            dz = (skip.shape[2] - up.shape[2]) // 2
            dy = (skip.shape[3] - up.shape[3]) // 2
            dx = (skip.shape[4] - up.shape[4]) // 2
            return up + skip[:, :, dz:dz + up.shape[2], dy:dy + up.shape[3],
                             dx:dx + up.shape[4]]

        def forward(s, x):
            r = lambda t: F.leaky_relu(t, 0.005)
            c2 = r(s.conv2(r(s.conv1(x))))
            p1 = F.max_pool3d(c2, (1, 3, 3))
            c4 = r(s.conv4(r(s.conv3(p1))))
            p2 = F.max_pool3d(c4, (1, 3, 3))
            c6 = r(s.conv6(r(s.conv5(p2))))
            p3 = F.max_pool3d(c6, (1, 3, 3))
            c8 = r(s.conv8(r(s.conv7(p3))))
            m1 = s.crop_add(s.conv9(s.dconv1(c8)), c6)
            c11 = r(s.conv11(r(s.conv10(m1))))
            m2 = s.crop_add(s.conv12(s.dconv2(c11)), c4)
            c14 = r(s.conv14(r(s.conv13(m2))))
            m3 = s.crop_add(s.conv15(s.dconv3(c14)), c2)
            c17 = r(s.conv17(r(s.conv16(m3))))
            return torch.sigmoid(s.conv18(c17))

    tm = TMala().eval()
    x = rng.uniform(0, 1, (1, 53, 268, 268, 1)).astype(np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()

    # our MALA with the same channel plan
    class TinyMALA(UNetMALA):
        pass

    import flax.linen as fnn

    class OurTiny(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            from gpemsr_tpu.models.seg.mala import DepthwiseUp, _crop_add, _lrelu

            from gpemsr_tpu.ops.conv3d import Conv3D

            def conv(h, f, name, kernel=(3, 3, 3)):
                return Conv3D(f, kernel, padding="VALID", name=name)(h)

            c2 = _lrelu(conv(_lrelu(conv(x, 4, "conv1")), 4, "conv2"))
            p1 = fnn.max_pool(c2, (1, 3, 3), strides=(1, 3, 3))
            c4 = _lrelu(conv(_lrelu(conv(p1, 6, "conv3")), 6, "conv4"))
            p2 = fnn.max_pool(c4, (1, 3, 3), strides=(1, 3, 3))
            c6 = _lrelu(conv(_lrelu(conv(p2, 8, "conv5")), 8, "conv6"))
            p3 = fnn.max_pool(c6, (1, 3, 3), strides=(1, 3, 3))
            c8 = _lrelu(conv(_lrelu(conv(p3, 10, "conv7")), 10, "conv8"))
            m1 = _crop_add(conv(DepthwiseUp(name="dconv1")(c8), 8, "conv9",
                                (1, 1, 1)), c6)
            c11 = _lrelu(conv(_lrelu(conv(m1, 8, "conv10")), 8, "conv11"))
            m2 = _crop_add(conv(DepthwiseUp(name="dconv2")(c11), 6, "conv12",
                                (1, 1, 1)), c4)
            c14 = _lrelu(conv(_lrelu(conv(m2, 6, "conv13")), 6, "conv14"))
            m3 = _crop_add(conv(DepthwiseUp(name="dconv3")(c14), 4, "conv15",
                                (1, 1, 1)), c2)
            c17 = _lrelu(conv(_lrelu(conv(m3, 4, "conv16")), 4, "conv17"))
            return jax.nn.sigmoid(conv(c17, 3, "conv18", (1, 1, 1)))

    variables = cv.convert_mala(tm.state_dict())
    out = OurTiny().apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=3e-4)


def test_superhuman_resblock_conversion(rng):
    """resBlock_pni + BN stats mapping (block1/block2/block3 key layout)."""
    from gpemsr_tpu.models.seg.superhuman import ResBlockPNI

    torch.manual_seed(1)

    class TRes(nn.Module):
        def __init__(s, cin, cout):
            super().__init__()
            s.block1 = nn.Sequential(
                nn.Conv3d(cin, cout, (1, 3, 3), padding=(0, 1, 1), bias=False),
                nn.BatchNorm3d(cout, momentum=0.001), nn.ELU())
            s.block2 = nn.Sequential(
                nn.Conv3d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm3d(cout, momentum=0.001), nn.ELU(),
                nn.Conv3d(cout, cout, 3, padding=1, bias=False))
            s.block3 = nn.BatchNorm3d(cout, momentum=0.001)

        def forward(s, x):
            r = s.block1(x)
            out = s.block3(r + s.block2(r))
            return F.elu(out)

    tm = TRes(3, 5)
    # give the BN stats non-trivial values
    with torch.no_grad():
        for bn in [tm.block1[1], tm.block2[1], tm.block3]:
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
    tm = tm.eval()

    x = rng.uniform(0, 1, (1, 4, 8, 8, 3)).astype(np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()

    sd = {f"rb.{k}": v for k, v in tm.state_dict().items()}
    t = cv._Tree()
    cv._res_pni(t, sd, "rb", ())
    variables = t.tree()
    out = ResBlockPNI(5).apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
                               atol=2e-4)
