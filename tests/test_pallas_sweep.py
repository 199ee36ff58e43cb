"""Cell-sweep Pallas grid-NN kernel (interpret mode): exactness below the
grid radius, sample isolation, masking, dual-flag fusion, and VJP parity
with the XLA grid backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflow_tpu.ops.chamfer import NNSpec


@pytest.fixture
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    import deflow_tpu.ops.voxel as V
    monkeypatch.setattr(V, "_use_pallas", lambda: True)


# small grid: 16 m box, 2 m cells → 8x8, few query chunks in interpret mode
SPEC = NNSpec(method="grid", cell=2.0, ring=1, lo=(-8.0, -8.0), hi=(8.0, 8.0))


def _clouds(seed, b=2, n=300, m=400, spread=7.5):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-spread, spread, (b, n, 3)).astype(np.float32)
    q = rng.uniform(-spread, spread, (b, m, 3)).astype(np.float32)
    p[..., 2] = rng.uniform(-1, 1, (b, n))
    q[..., 2] = rng.uniform(-1, 1, (b, m))
    mp = rng.random((b, n)) > 0.15
    mq = rng.random((b, m)) > 0.15
    fp = rng.random((b, n)) > 0.5
    fq = rng.random((b, m)) > 0.5
    return p, q, mp, mq, fp, fq


def _brute_truncated(p, q, mq, t2):
    """min(truncated NN distance) per query against masked candidates."""
    d = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    d[:, ~mq] = np.inf
    return np.minimum(d.min(1) if mq.any() else np.full(len(p), np.inf), t2)


def test_sweep_matches_brute_below_radius(interpret_pallas):
    from deflow_tpu.ops.chamfer import chamfer_distance

    p, q, mp, mq, _, _ = _clouds(0)
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mp), jnp.asarray(mq), spec=SPEC)
    t2 = SPEC.cell ** 2
    for b in range(p.shape[0]):
        ref0 = _brute_truncated(p[b], q[b], mq[b], t2)
        got0 = np.minimum(np.asarray(d0[b]), t2)
        np.testing.assert_allclose(got0[mp[b]], ref0[mp[b]], rtol=1e-5,
                                   atol=1e-5)
        ref1 = _brute_truncated(q[b], p[b], mp[b], t2)
        got1 = np.minimum(np.asarray(d1[b]), t2)
        np.testing.assert_allclose(got1[mq[b]], ref1[mq[b]], rtol=1e-5,
                                   atol=1e-5)


def test_sweep_sample_isolation(interpret_pallas):
    """Identical coordinates in different batch samples must not match."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    pts = np.random.default_rng(1).uniform(-7, 7, (64, 3)).astype(np.float32)
    p = np.stack([pts, pts + 100.0])          # sample 1 far outside the grid
    q = np.stack([pts + 100.0, pts])          # candidates swapped
    # sample 0 candidates are clipped into boundary cells (far in truth);
    # NN distances must be huge, not zero, despite sample-1 matching coords
    mp = np.ones((2, 64), bool)
    mq = np.ones((2, 64), bool)
    d0, _ = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                             jnp.asarray(mp), jnp.asarray(mq), spec=SPEC)
    assert float(jnp.min(d0)) > SPEC.cell ** 2


def test_sweep_dual_flag_matches_two_calls(interpret_pallas):
    from deflow_tpu.ops.chamfer import chamfer_distance, ssl_chamfer_distances

    p, q, mp, mq, fp, fq = _clouds(2)
    args = [jnp.asarray(x) for x in (p, q, mp, mq)]
    d0a, d1a, d0f, d1f = ssl_chamfer_distances(
        args[0], args[1], args[2], args[3],
        jnp.asarray(fp), jnp.asarray(fq), truncate=SPEC.cell, spec=SPEC)
    r0a, r1a = chamfer_distance(*args, spec=SPEC)
    rf = chamfer_distance(args[0], args[1],
                          args[2] & jnp.asarray(fp), args[3] & jnp.asarray(fq),
                          spec=SPEC)
    t2 = SPEC.cell ** 2
    np.testing.assert_allclose(np.minimum(d0a, t2), np.minimum(r0a, t2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.minimum(d1a, t2), np.minimum(r1a, t2),
                               rtol=1e-5, atol=1e-5)
    dyn_q0 = np.asarray(args[2] & jnp.asarray(fp))
    got = np.minimum(np.asarray(d0f), t2)[dyn_q0]
    ref = np.minimum(np.asarray(rf[0]), t2)[dyn_q0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sweep_matches_xla_grid_backend(interpret_pallas, monkeypatch):
    """Kernel path == XLA grid path (same contract) on clouds with
    below-capacity cells — including matched-index-driven gradients."""
    import deflow_tpu.ops.voxel as V
    from deflow_tpu.ops import chamfer as C

    p, q, mp, mq, fp, fq = _clouds(3)
    args = (jnp.asarray(p), jnp.asarray(q), jnp.asarray(mp), jnp.asarray(mq),
            jnp.asarray(fp), jnp.asarray(fq))

    def loss(pc0, pc1):
        d0, d1, dd0, dd1 = C.ssl_chamfer_distances(
            pc0, pc1, args[2], args[3], args[4], args[5],
            truncate=SPEC.cell, spec=SPEC)
        t2 = SPEC.cell ** 2
        return (jnp.sum(jnp.minimum(d0, t2)) + jnp.sum(jnp.minimum(d1, t2))
                + jnp.sum(jnp.minimum(dd0, t2))
                + jnp.sum(jnp.minimum(dd1, t2)))

    v_k, g_k = jax.value_and_grad(loss, argnums=(0, 1))(args[0], args[1])

    monkeypatch.setattr(V, "_use_pallas", lambda: False)
    v_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(args[0], args[1])

    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    for gk, gx in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


def test_sweep_empty_sample(interpret_pallas):
    from deflow_tpu.ops.chamfer import chamfer_distance

    p, q, mp, mq, _, _ = _clouds(4)
    mp[1] = False                              # sample 1 has no valid queries
    mq[0] = False                              # sample 0 has no candidates
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mp), jnp.asarray(mq), spec=SPEC)
    assert np.all(np.isfinite(np.asarray(d0)))
    assert np.all(np.asarray(d0)[~mp] == 0.0)
    # no-candidate sample: distances are the BIG sentinel (truncation clips)
    assert np.all(np.asarray(d0)[0][mp[0]] > SPEC.cell ** 2)
    assert np.all(np.asarray(d1)[~mq] == 0.0)


def test_sweep_no_capacity_limit(interpret_pallas):
    """All points in one cell (way past the XLA backend's capacity=128):
    the kernel is exact anyway — no overflow drops."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    rng = np.random.default_rng(5)
    p = rng.uniform(0.1, 1.9, (1, 300, 3)).astype(np.float32)
    q = rng.uniform(0.1, 1.9, (1, 400, 3)).astype(np.float32)
    p[..., 2] = 0.0
    q[..., 2] = 0.0
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q), spec=SPEC)
    full = ((p[0][:, None, :] - q[0][None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d0[0]), full.min(1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1[0]), full.min(0),
                               rtol=1e-5, atol=1e-5)


def test_sweep_other_cell_size(interpret_pallas):
    """Generality: 1 m cells / different grid dims obey the same exactness
    contract (exact below ring*cell = 1 m)."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    spec = NNSpec(method="grid", cell=1.0, ring=1,
                  lo=(-6.0, -6.0), hi=(6.0, 6.0))
    p, q, mp, mq, _, _ = _clouds(7, b=2, n=200, m=250, spread=5.5)
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mp), jnp.asarray(mq), spec=spec)
    t2 = 1.0
    for b in range(2):
        ref = _brute_truncated(p[b], q[b], mq[b], t2)
        np.testing.assert_allclose(
            np.minimum(np.asarray(d0[b]), t2)[mp[b]], ref[mp[b]],
            rtol=1e-5, atol=1e-5)


def test_sweep_totally_empty_candidates(interpret_pallas):
    """Whole candidate cloud masked out: all distances are the BIG sentinel
    (clipped by truncation), no NaNs, kernel does zero DMA work."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    p, q, mp, mq, _, _ = _clouds(8)
    mq[:] = False
    d0, d1 = chamfer_distance(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mp), jnp.asarray(mq), spec=SPEC)
    assert np.all(np.isfinite(np.asarray(d0)))
    assert np.all(np.asarray(d0)[mp] > SPEC.cell ** 2)
    assert np.all(np.asarray(d1) == 0.0)       # masked rows zeroed


def test_sweep_sample_isolation_large_radius(interpret_pallas):
    """The sample-isolation w step scales with ring·cell: identical
    coordinates in different samples must not match even when the exactness
    radius is far larger than the default 1000 m step floor would need."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    spec = NNSpec(method="grid", cell=2500.0, ring=1,
                  lo=(-5000.0, -5000.0), hi=(5000.0, 5000.0))
    pts = np.random.default_rng(9).uniform(
        -4000, 4000, (96, 3)).astype(np.float32)
    q0 = pts + np.float32([9000.0, 0.0, 0.0])   # sample 0: true NN far
    d0, _ = chamfer_distance(
        jnp.asarray(np.stack([pts, pts])),
        jnp.asarray(np.stack([q0, pts])),       # sample 1 would match at 0
        spec=spec)
    # Exactness contract check against brute force, truncated at
    # radius² = (ring·cell)² = 6.25e6: below radius the kernel is exact,
    # above it may only overestimate (so both sides clip to radius²).
    # A cross-sample leak with the UNSCALED 1000 m w-step would report
    # 0 + 1000² = 1e6 — below radius² and below every true distance here
    # (the 9000 m shift keeps all true NNs ≥ 1000 m, some < radius), so the
    # truncated comparison catches a wstep >= 2·ring·cell scaling
    # regression; the correctly scaled wstep = 5000 puts leaked pairs at
    # 25e6, clipped away.
    radius2 = (spec.ring * spec.cell) ** 2
    brute = np.min(
        ((pts[:, None, :] - q0[None, :, :]) ** 2).sum(-1), axis=1)
    np.testing.assert_allclose(
        np.minimum(np.asarray(d0[0]), radius2),
        np.minimum(brute, radius2), rtol=1e-5)


def test_sweep_duplicate_and_single_points(interpret_pallas):
    """Exact duplicates match at distance 0; a single valid point per sample
    still resolves (the chunk machinery handles 1-row spans)."""
    from deflow_tpu.ops.chamfer import chamfer_distance

    p = np.zeros((2, 8, 3), np.float32)
    p[0, :, 0] = 1.0
    p[1, :, 0] = -3.0
    q = p.copy() + np.float32([0.5, 0.0, 0.0])  # within the same/next cell
    mp = np.zeros((2, 8), bool)
    mp[:, 0] = True                              # one valid query per sample
    mq = np.ones((2, 8), bool)
    d0, _, i0, _ = chamfer_distance(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(mp), jnp.asarray(mq),
        spec=SPEC, return_idx=True)
    np.testing.assert_allclose(np.asarray(d0)[:, 0], 0.25, rtol=1e-6)
    # duplicates in q: any of the 8 identical rows is a valid match
    assert 0 <= int(np.asarray(i0)[0, 0]) < 8


def _host_c1(q, mq, fq, spec):
    from deflow_tpu.data.host_prep import chamfer_cell_prep

    cps = [chamfer_cell_prep(q[i], mq[i], fq[i] & mq[i], cell=spec.cell,
                             lo=spec.lo, hi=spec.hi)
           for i in range(q.shape[0])]
    return (jnp.asarray(np.stack([c["lanes"] for c in cps])),
            jnp.asarray(np.stack([c["sid"] for c in cps])),
            jnp.asarray(np.stack([c["start"] for c in cps])))


def test_hosted_cell_prep_matches_device_sort(interpret_pallas):
    """The loader's pc1 chamfer cell prep (host pre-sort) is equivalent to
    the device `_sweep_sort` path: identical distances for all four outputs
    (bit-exact — both paths run the same kernel arithmetic on the same
    per-cell candidate order), matched indices point at equal-distance rows,
    and the SeFlow-shaped VJP agrees."""
    from deflow_tpu.ops import chamfer as CH

    p, q, mp, mq, fp, fq = _clouds(11, b=2, n=300, m=400)
    args = (jnp.asarray(np.where(mp[..., None], p, 0.0)),
            jnp.asarray(np.where(mq[..., None], q, 0.0)),
            jnp.asarray(mp), jnp.asarray(mq),
            jnp.asarray(fp & mp), jnp.asarray(fq & mq))
    hc1 = _host_c1(q, mq, fq, SPEC)

    ref = CH._ssl_nn(*args, SPEC)
    hos = CH._ssl_nn_hosted(*args, *hc1, SPEC)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(hos[k]))
    # matched indices: equal-distance rows (tie winners may differ between
    # the two layouts; the distance through the index must not)
    i0 = np.asarray(hos[4])
    d0 = np.asarray(hos[0])
    qn = np.where(mq[..., None], q, 0.0)
    for b in range(p.shape[0]):
        rows = mp[b] & (d0[b] < SPEC.cell ** 2)  # exactness region
        dd = ((np.where(mp[b][:, None], p[b], 0.0)[rows]
               - qn[b][i0[b][rows]]) ** 2).sum(-1)
        np.testing.assert_allclose(dd, d0[b][rows], rtol=1e-6, atol=1e-6)

    # SeFlow-shaped VJP (gradient wrt the warped side only)
    t2 = float(SPEC.cell ** 2)

    def loss_ref(p0):
        o = CH._ssl_nn(p0, *args[1:], SPEC)[:4]
        return sum(jnp.sum(jnp.minimum(d, t2)) for d in o)

    def loss_hos(p0):
        o = CH._ssl_nn_hosted(p0, *args[1:], *hc1, SPEC)[:4]
        return sum(jnp.sum(jnp.minimum(d, t2)) for d in o)

    g_ref = jax.grad(loss_ref)(args[0])
    g_hos = jax.grad(loss_hos)(args[0])
    np.testing.assert_allclose(np.asarray(g_hos), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_seflow_loss_uses_hosted_cell_prep(interpret_pallas):
    """seflow_loss picks up the loader's chamfer cell keys and produces the
    same value/gradient as without them; a geometry-mismatched start table
    falls back to the device sort silently."""
    from deflow_tpu.data.host_prep import chamfer_cell_prep
    from deflow_tpu.losses import seflow_loss

    rng = np.random.default_rng(5)
    b, n = 2, 300
    pc0 = rng.uniform(-7.5, 7.5, (b, n, 3)).astype(np.float32)
    pc1 = rng.uniform(-7.5, 7.5, (b, n, 3)).astype(np.float32)
    m = np.ones((b, n), bool)
    dufo0 = (rng.random((b, n)) > 0.6).astype(np.int32)
    dufo1 = (rng.random((b, n)) > 0.6).astype(np.int32)
    flow = rng.normal(0, 0.1, (b, n, 3)).astype(np.float32)
    out = {"flow": jnp.asarray(flow),
           "pose_flow": jnp.zeros((b, n, 3), jnp.float32),
           "pc0_valid": jnp.asarray(m), "pc1_valid": jnp.asarray(m)}
    base = {"pc0": jnp.asarray(pc0), "pc1": jnp.asarray(pc1),
            "pc0_mask": jnp.asarray(m), "pc1_mask": jnp.asarray(m),
            "dufo_label0": jnp.asarray(dufo0),
            "dufo_label1": jnp.asarray(dufo1)}
    # chamfer_method="grid" with default truncate=2.0 -> cell 2.0, +/-51.2
    cps = [chamfer_cell_prep(pc1[i], m[i], m[i] & (dufo1[i] > 0))
           for i in range(b)]
    hosted = dict(base)
    hosted["pc1_cell_lanes"] = jnp.asarray(np.stack([c["lanes"] for c in cps]))
    hosted["pc1_cell_sid"] = jnp.asarray(np.stack([c["sid"] for c in cps]))
    hosted["pc1_cell_start"] = jnp.asarray(np.stack([c["start"] for c in cps]))

    f_base = lambda fl: seflow_loss({**out, "flow": fl}, base,
                                    chamfer_method="grid")
    f_host = lambda fl: seflow_loss({**out, "flow": fl}, hosted,
                                    chamfer_method="grid")
    v0, g0 = jax.value_and_grad(f_base)(out["flow"])
    v1, g1 = jax.value_and_grad(f_host)(out["flow"])
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)

    # mismatched geometry (wrong cell) -> gate rejects, still correct
    bad = dict(hosted)
    bad["pc1_cell_start"] = bad["pc1_cell_start"][:, :31]
    v2 = seflow_loss(out, bad, chamfer_method="grid")
    assert float(v2) == pytest.approx(float(v0), rel=1e-6)


def test_sweep_clean_chunks_match_all_dirty(interpret_pallas, monkeypatch):
    """The conditional-w clean path must be BIT-IDENTICAL to the always-w
    (all-dirty) kernel on multi-sample masked clouds — and the cloud must
    be large enough that some chunks actually take the clean path."""
    import deflow_tpu.ops.chamfer as CH
    import deflow_tpu.ops.pallas_sweep as PS

    # dense enough that interior chunks pass the row-space window check
    p, q, mp, mq, fp, fq = _clouds(3, b=2, n=1024, m=1536)
    args = [jnp.where(jnp.asarray(mp)[..., None], jnp.asarray(p), 0.0),
            jnp.where(jnp.asarray(mq)[..., None], jnp.asarray(q), 0.0),
            jnp.asarray(mp), jnp.asarray(mq), jnp.asarray(fp),
            jnp.asarray(fq)]

    seen = {}
    orig = PS.cell_sweep_pallas

    def spy(q_slab, c_slab, cs, cn, dirty=None, dual=True):
        seen.setdefault("dirty", []).append(np.asarray(dirty))
        return orig(q_slab, c_slab, cs, cn, dirty, dual)

    monkeypatch.setattr(PS, "cell_sweep_pallas", spy)
    monkeypatch.setattr(CH, "cell_sweep_pallas", spy, raising=False)
    base = CH._ssl_nn(*args, SPEC)

    def all_dirty(q_slab, c_slab, cs, cn, dirty=None, dual=True):
        return orig(q_slab, c_slab, cs, cn, None, dual)

    monkeypatch.setattr(PS, "cell_sweep_pallas", all_dirty)
    monkeypatch.setattr(CH, "cell_sweep_pallas", all_dirty, raising=False)
    ref = CH._ssl_nn(*args, SPEC)

    dirt = np.concatenate([d for d in seen["dirty"] if d is not None])
    assert (dirt == 0).any(), "no clean chunk exercised — test is vacuous"
    assert (dirt == 1).any()
    for a, b in zip(base, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
