"""Space-to-depth conv1 == the plain k=8/s=2/p=3 conv, exactly."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from deflow_tpu.models.unet import SpaceToDepthConv


def test_s2d_conv_matches_plain_conv():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 32)).astype(np.float32)

    s2d = SpaceToDepthConv(out_channels=64, in_channels=32)
    variables = s2d.init(jax.random.key(0), jnp.asarray(x))
    # randomize: lecun init is fine but make bias nonzero too
    k = rng.normal(size=(8, 8, 32, 64)).astype(np.float32) * 0.05
    b = rng.normal(size=(64,)).astype(np.float32)
    variables = {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}
    got = np.asarray(s2d.apply(variables, jnp.asarray(x)))

    plain = nn.Conv(64, (8, 8), strides=(2, 2), padding=((3, 3), (3, 3)))
    want = np.asarray(plain.apply(
        {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}},
        jnp.asarray(x)))
    assert got.shape == want.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _fold(x):
    """[B, H, W, C] → phase-folded [B, H/2, W/2, 4C]."""
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c))


def _unfold(y):
    b, h2, w2, mc = y.shape
    c = mc // 4
    return (y.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h2 * 2, w2 * 2, c))


def test_unet_s2d_matches_plain():
    """The fully phase-folded UNet (s2d stem + s2d decoder tail: fused
    bilinear-upsample conv, per-phase 1x1s, structured 3x3) must equal the
    plain UNet on the same parameters — the param trees are identical."""
    from deflow_tpu.models.unet import FastFlow3DUNet

    rng = np.random.default_rng(3)
    img0 = rng.normal(size=(2, 32, 32, 32)).astype(np.float32)
    img1 = rng.normal(size=(2, 32, 32, 32)).astype(np.float32)

    plain = FastFlow3DUNet(s2d=False)
    variables = plain.init(jax.random.key(0), jnp.asarray(img0),
                           jnp.asarray(img1))
    want = np.asarray(plain.apply(variables, jnp.asarray(img0),
                                  jnp.asarray(img1)))

    folded = FastFlow3DUNet(s2d=True)
    got_s2d = folded.apply(variables, jnp.asarray(_fold(img0)),
                           jnp.asarray(_fold(img1)))
    got = _unfold(np.asarray(got_s2d))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_odd_grid_falls_back_to_plain_conv():
    """Odd pillar grids use row-major ids (VoxelConfig.use_s2d False) and the
    UNet stem must fall back to the plain stride-2 conv on the SAME params."""
    from flax import linen as nn

    from deflow_tpu.models.unet import SpaceToDepthConv

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 31, 31, 32)).astype(np.float32)  # odd H, W
    k = rng.normal(size=(8, 8, 32, 64)).astype(np.float32) * 0.05
    b = rng.normal(size=(64,)).astype(np.float32)
    variables = {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}

    got = np.asarray(SpaceToDepthConv(64, 32).apply(variables, jnp.asarray(x)))
    want = np.asarray(nn.Conv(64, (8, 8), strides=(2, 2),
                              padding=((3, 3), (3, 3))).apply(
        variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_s2d_param_tree_matches_checkpoint_layout():
    """The converter writes encoder_step_1/conv/kernel with torch's [8,8,C,O]
    (transposed) shape — the s2d module must keep that exact tree."""
    from deflow_tpu.models.unet import FastFlow3DUNet

    unet = FastFlow3DUNet()
    x = jnp.zeros((1, 32, 32, 32))
    variables = unet.init(jax.random.key(0), x, x)
    leaf = variables["params"]["encoder_step_1"]["conv"]["kernel"]
    assert leaf.shape == (8, 8, 32, 64)
    assert variables["params"]["encoder_step_1"]["conv"]["bias"].shape == (64,)


def test_remat_unet_matches_plain(monkeypatch):
    """DEFLOW_REMAT in {1, conv}: identical parameter tree, identical
    forward, and matching gradients up to reduction reassociation (remat
    only changes what the backward recomputes vs stashes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deflow_tpu.models.unet import FastFlow3DUNet

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 32)).astype(np.float32))

    plain = FastFlow3DUNet(dtype=jnp.float32)
    variables = plain.init(jax.random.key(0), a, b, True)

    def grads(mod):
        def loss(p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                a, b, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return jax.jit(jax.value_and_grad(loss))(variables["params"])

    v0, g0 = grads(plain)
    for mode in ("1", "conv"):
        monkeypatch.setenv("DEFLOW_REMAT", mode)
        vr, gr = grads(FastFlow3DUNet(dtype=jnp.float32))
        assert jax.tree.structure(gr) == jax.tree.structure(g0)
        np.testing.assert_allclose(float(vr), float(v0), rtol=1e-6)
        # atol covers the BN-preceded conv biases, whose gradients are
        # analytically zero and numerically pure cancellation noise (~1e-3)
        jax.tree.map(lambda x, y: np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=2e-4, atol=3e-3), g0, gr)
