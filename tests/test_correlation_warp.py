"""Correlation + resample2d + channelnorm op tests.

Oracles: a dead-simple python loop for correlation (the definition from
FlowNet arXiv:1504.06852 / the CUDA kernel contract in SURVEY.md section 3)
and scipy.ndimage.map_coordinates for the bilinear warp (SURVEY.md section 5
test strategy).
"""

import functools

import numpy as np
import pytest
from scipy import ndimage

import jax
import jax.numpy as jnp

from flowtrack_tpu.ops.correlation import (
    correlation,
    correlation_pallas,
    correlation_xla,
    displacement_grid,
)
from flowtrack_tpu.ops.warp import channelnorm, flow_gather, resample2d


def corr_oracle(f1, f2, md=20, s2=2):
    n, h, w, c = f1.shape
    disps = list(range(-md, md + 1, s2))
    d = len(disps)
    out = np.zeros((n, h, w, d * d), np.float32)
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    for i, dy in enumerate(disps):
        for j, dx in enumerate(disps):
            shifted = f2p[:, md + dy: md + dy + h, md + dx: md + dx + w]
            out[..., i * d + j] = (f1 * shifted).sum(-1) / c
    return out


class TestCorrelation:
    def test_xla_matches_oracle_small(self, rng):
        # tiny md so the oracle is cheap; shapes deliberately non-aligned
        f1 = rng.normal(size=(2, 9, 11, 8)).astype(np.float32)
        f2 = rng.normal(size=(2, 9, 11, 8)).astype(np.float32)
        got = np.asarray(correlation_xla(f1, f2, max_displacement=4, stride2=2))
        want = corr_oracle(f1, f2, md=4, s2=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pallas_matches_xla(self, rng):
        f1 = rng.normal(size=(1, 12, 16, 32)).astype(np.float32)
        f2 = rng.normal(size=(1, 12, 16, 32)).astype(np.float32)
        want = np.asarray(correlation_xla(f1, f2, max_displacement=4, stride2=2))
        got = np.asarray(correlation_pallas(
            f1, f2, max_displacement=4, stride2=2, block_h=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pallas_vmap_folds_into_image_dim(self, rng):
        """vmap over the Pallas path (the C-stream clips layout) must hit
        the custom batching rule — Pallas' automatic pallas_call batching
        gives the HBM-resident f2 operand a non-trivial index_map, which
        the TPU lowering rejects (measured on-chip 2026-08-19; bench.py's
        OOM fallback masked it by matching 'memory' in the error). The
        rule folds the mapped axis into the kernel's image dim: bitwise
        vs stacked unbatched calls, gradients match the XLA formulation,
        and the real TPU lowering (jax.export, no chip needed) accepts
        the vmapped program."""
        import jax
        import jax.numpy as jnp

        f1 = jnp.asarray(rng.normal(size=(2, 3, 8, 16, 8)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(2, 3, 8, 16, 8)), jnp.float32)
        fi = jax.vmap(lambda a, b: correlation(
            a, b, max_displacement=4, stride2=2, use_pallas=True,
            interpret=True))
        got = np.asarray(fi(f1, f2))
        want = np.stack([np.asarray(correlation(
            f1[i], f2[i], max_displacement=4, stride2=2, use_pallas=True,
            interpret=True)) for i in range(2)])
        np.testing.assert_array_equal(got, want)

        g = jax.grad(lambda a: jnp.sum(jnp.sin(fi(a, f2))))(f1)
        gx = jax.grad(lambda a: jnp.sum(jnp.sin(jax.vmap(
            lambda x, y: correlation_xla(x, y, 4, 2))(a, f2))))(f1)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gx),
                                   rtol=1e-5, atol=1e-5)

        # the regression pin: TPU lowering of the vmapped NON-interpret
        # kernel (this is what failed on hardware)
        ftpu = jax.vmap(lambda a, b: correlation(
            a, b, max_displacement=4, stride2=2, use_pallas=True))
        exp = jax.export.export(jax.jit(ftpu), platforms=["tpu"])(f1, f2)
        assert exp.out_avals[0].shape == (2, 3, 8, 16, 25)

    @pytest.mark.slow
    def test_pallas_full_displacement_grid(self, rng):
        # the production config: md=20, stride2=2 -> 441 channels
        f1 = rng.normal(size=(1, 10, 12, 16)).astype(np.float32)
        f2 = rng.normal(size=(1, 10, 12, 16)).astype(np.float32)
        want = np.asarray(correlation_xla(f1, f2))
        got = np.asarray(correlation_pallas(f1, f2, block_h=5, interpret=True))
        assert got.shape == (1, 10, 12, 441)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pallas_grad_matches_xla(self, rng):
        """The custom VJP of the Pallas path (backward = XLA formulation,
        ops/correlation.py _corr_bwd) must produce the same cotangents as
        differentiating correlation_xla directly (VERDICT round-1 item 4)."""
        import jax
        import jax.numpy as jnp

        from flowtrack_tpu.ops.correlation import _correlation_pallas_diff

        f1 = rng.normal(size=(1, 8, 10, 8)).astype(np.float32)
        f2 = rng.normal(size=(1, 8, 10, 8)).astype(np.float32)
        g = rng.normal(size=(1, 8, 10, 25)).astype(np.float32)

        def loss_pallas(a, b):
            return jnp.sum(_correlation_pallas_diff(a, b, 4, 2, True) * g)

        def loss_xla(a, b):
            return jnp.sum(correlation_xla(a, b, 4, 2) * g)

        gp1, gp2 = jax.grad(loss_pallas, (0, 1))(f1, f2)
        gx1, gx2 = jax.grad(loss_xla, (0, 1))(f1, f2)
        assert np.isfinite(np.asarray(gp1)).all()
        assert np.isfinite(np.asarray(gp2)).all()
        np.testing.assert_allclose(np.asarray(gp1), np.asarray(gx1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp2), np.asarray(gx2),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_grad_finite_difference(self, rng):
        """Directional finite-difference check of the custom VJP."""
        import jax
        import jax.numpy as jnp

        from flowtrack_tpu.ops.correlation import _correlation_pallas_diff

        f1 = rng.normal(size=(1, 6, 7, 4)).astype(np.float64)
        f2 = rng.normal(size=(1, 6, 7, 4)).astype(np.float64)
        d1 = rng.normal(size=f1.shape)
        d2 = rng.normal(size=f2.shape)

        def loss(a, b):
            out = _correlation_pallas_diff(
                a.astype(jnp.float32), b.astype(jnp.float32), 2, 2, True)
            return jnp.sum(jnp.sin(out))

        g1, g2 = jax.grad(loss, (0, 1))(jnp.asarray(f1), jnp.asarray(f2))
        want = float(np.sum(np.asarray(g1) * d1) + np.sum(np.asarray(g2) * d2))
        eps = 1e-4
        lp = float(loss(jnp.asarray(f1 + eps * d1), jnp.asarray(f2 + eps * d2)))
        lm = float(loss(jnp.asarray(f1 - eps * d1), jnp.asarray(f2 - eps * d2)))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(want, fd, rtol=5e-3)

    def test_self_correlation_center_channel(self, rng):
        # zero displacement channel of corr(f, f) == mean(f^2) over C
        f = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
        d = len(displacement_grid(4, 2))
        out = np.asarray(correlation_xla(f, f, 4, 2))
        center = (d * d) // 2
        np.testing.assert_allclose(
            out[..., center], (f * f).mean(-1), rtol=1e-5, atol=1e-5)


class TestResample2d:
    def test_matches_map_coordinates(self, rng):
        img = rng.normal(size=(1, 12, 17, 3)).astype(np.float32)
        flow = (rng.normal(size=(1, 12, 17, 2)) * 2).astype(np.float32)
        got = np.asarray(resample2d(img, flow))

        ys, xs = np.mgrid[0:12, 0:17].astype(np.float64)
        for ch in range(3):
            want = ndimage.map_coordinates(
                img[0, :, :, ch],
                [np.clip(ys + flow[0, :, :, 1], 0, 11),
                 np.clip(xs + flow[0, :, :, 0], 0, 16)],
                order=1, mode="nearest")
            np.testing.assert_allclose(got[0, :, :, ch], want,
                                       rtol=1e-5, atol=1e-5)

    def test_zero_flow_is_identity(self, rng):
        img = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        out = np.asarray(resample2d(img, np.zeros((2, 8, 8, 2), np.float32)))
        np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)

    def test_integer_shift(self, rng):
        img = rng.normal(size=(1, 8, 8, 1)).astype(np.float32)
        flow = np.full((1, 8, 8, 2), 0.0, np.float32)
        flow[..., 0] = 1.0  # sample at x+1
        out = np.asarray(resample2d(img, flow))
        np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0],
                                   rtol=1e-6, atol=1e-6)


class TestResample2dPallas:
    """BOTH Pallas warp kernels (shift-accumulate and matmul,
    ops/warp.py) must reproduce the XLA slice-gather path. Tolerance
    note (measured): strict bitwise equality is not well-defined for
    this op — jitting the EXISTING XLA path already moves results by 1
    ulp vs eager (XLA contracts mul+add into FMA) — so the contract
    pinned here is a few ulp against the XLA path (shift: FMA-order
    differences; matmul: f32 HIGHEST contraction), plus TRUE bitwise
    equality at integer flows where every weight is an exact 0/1 and no
    rounding can differ."""

    @pytest.fixture(params=["shift", "matmul", "matmul_v3"])
    def impl(self, request):
        return request.param

    def _pallas(self, img, flow, impl="shift"):
        from flowtrack_tpu.ops.warp import (resample2d_pallas,
                                            resample2d_pallas_mm)
        if impl == "shift":
            fn = resample2d_pallas
        else:  # matmul_v3: the relu-form weight construction (same
            # contract — <=1 extra ulp on the second tap's weight)
            fn = functools.partial(resample2d_pallas_mm,
                                   relu_weights=(impl == "matmul_v3"))
        return np.asarray(fn(
            jnp.asarray(img), jnp.asarray(flow), interpret=True))

    @pytest.mark.parametrize("h,w,c,scale", [
        (16, 24, 3, 2.0),     # cascade-like smooth flow
        (24, 16, 3, 30.0),    # large displacements
        (13, 27, 3, 5.0),     # ragged dims (row padding + lane remainder)
        (8, 128, 2, 5.0),     # full lane tile
        (16, 24, 3, 300.0),   # everything clamped to the edges
    ])
    def test_matches_xla_within_ulp(self, rng, impl, h, w, c, scale):
        img = rng.normal(size=(2, h, w, c)).astype(np.float32)
        flow = (rng.uniform(-scale, scale, (2, h, w, 2))).astype(np.float32)
        want = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
        got = self._pallas(img, flow, impl)
        tol = 4 * np.finfo(np.float32).eps * np.abs(img).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=tol)

    def test_bf16_matches_xla_bf16(self, rng, impl):
        # the bf16-glue cascade feeds bf16 images through the kernels;
        # on-chip this exercises the f32-round-trip lane rotate (shift:
        # tpu.dynamic_rotate is 32-bit-only — see _roll_lanes) and the
        # f32-select A build (matmul: sub-32-bit selects hit an i1
        # relayout Mosaic cannot do). Values follow the same factored
        # arithmetic as the XLA path, so the tolerance is the bf16
        # analog of the f32 ulp contract.
        img = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
        flow = rng.uniform(-5, 5, (2, 16, 24, 2)).astype(np.float32)
        img16 = np.asarray(jnp.asarray(img, jnp.bfloat16))
        want = np.asarray(resample2d(jnp.asarray(img16), jnp.asarray(flow)),
                          np.float32)
        got = self._pallas(img16, flow, impl).astype(np.float32)
        tol = 2 * 2.0 ** -8 * np.abs(img).max()  # 2 bf16 ulps
        np.testing.assert_allclose(got, want, rtol=0, atol=tol)

    def test_bitwise_at_integer_flows(self, rng, impl):
        img = rng.normal(size=(1, 16, 24, 3)).astype(np.float32)
        flow = rng.integers(-6, 7, (1, 16, 24, 2)).astype(np.float32)
        want = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_array_equal(self._pallas(img, flow, impl), want)

    def test_entry_flag_and_degenerate_fallback(self, rng):
        # use_pallas=True routes through the kernel; degenerate fields
        # (h<2) fall back to the XLA semantics instead of crashing
        img = rng.normal(size=(1, 1, 9, 3)).astype(np.float32)
        flow = rng.normal(size=(1, 1, 9, 2)).astype(np.float32)
        want = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
        got = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow),
                                    use_pallas=True, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_vmem_size_gate(self):
        from flowtrack_tpu.ops.warp import (_PALLAS_WARP_VMEM_CAP,
                                            _pallas_warp_supported,
                                            _pallas_warp_vmem_bytes)
        # production cascade shapes stay admitted (both classes measured
        # running on-chip; the 256x192 class with >=2x headroom)
        for shape in [(1, 256, 192, 3), (1, 384, 320, 3)]:
            img = np.zeros(shape, np.float32)
            assert _pallas_warp_supported(img)
        assert (_pallas_warp_vmem_bytes(np.zeros((1, 256, 192, 3),
                                                 np.float32))
                <= _PALLAS_WARP_VMEM_CAP / 2)
        # the cap is Mosaic's measured scoped-vmem stack limit: 16 MB.
        # wp=640 (estimate 31.9 MB, real 24.9 MB) crashed compile under
        # the old 32 MB cap on-chip — it must be rejected.
        assert _PALLAS_WARP_VMEM_CAP == 16 * 2**20
        assert not _pallas_warp_supported(
            np.zeros((1, 256, 640, 3), np.float32))
        assert not _pallas_warp_supported(
            np.zeros((1, 2048, 2048, 3), np.float32))

    def test_vmem_budget_math(self):
        """The budget must include the mm kernel's temporaries — the
        quadratic-in-width one-hot matrix a_mat + its int32 iota, the
        chunk slices and the accumulator — not just the image block
        (round-4 VERDICT weak #4: the old image-only budget admitted
        shapes whose a_mat alone was 8.4 MB at wp=512)."""
        from flowtrack_tpu.ops.warp import (_WARP_BLOCK_H, _WARP_MM_CHUNK,
                                            _pallas_warp_vmem_bytes)
        bh, s = _WARP_BLOCK_H, _WARP_MM_CHUNK
        h, w, wp = 256, 320, 384  # wp = lane-padded width
        want = ((h + 2 * bh + s) * 8 * wp * 4      # resident image block
                + 2 * bh * wp * wp * 4             # a_mat + its iota
                + 2 * (s + bh) * 8 * wp * 4        # chunk slice + dot out
                + 2 * bh * 8 * wp * 4)             # accumulator + out
        got = _pallas_warp_vmem_bytes(np.zeros((1, h, w, 3), np.float32))
        assert got == want

    def test_first_rejected_shape_falls_back_to_xla(self, rng, monkeypatch):
        """Walk the width axis to the guard's boundary: the last admitted
        128-multiple exists, and the FIRST rejected one must route
        use_pallas=True to the XLA gather (identical values) without ever
        entering the kernel."""
        from flowtrack_tpu.ops import warp as warp_mod
        h = 256
        w = next(w for w in range(128, 8192, 128)
                 if not warp_mod._pallas_warp_supported(
                     np.zeros((1, h, w, 3), np.float32)))
        assert warp_mod._pallas_warp_supported(
            np.zeros((1, h, w - 128, 3), np.float32))

        def boom(*a, **k):
            raise AssertionError("kernel entered for a rejected shape")

        monkeypatch.setattr(warp_mod, "_resample2d_pallas_diff", boom)
        img = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        flow = rng.uniform(-3, 3, (1, h, w, 2)).astype(np.float32)
        want = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
        got = np.asarray(warp_mod.resample2d(
            jnp.asarray(img), jnp.asarray(flow), use_pallas=True,
            matmul=True))
        np.testing.assert_array_equal(got, want)

    def test_gradients_match_xla_path(self, rng, impl):
        # the custom VJP must route gradients (XLA formulation) through
        # the use_pallas entry; checked against the plain path AND a
        # finite difference
        img = jnp.asarray(rng.normal(size=(1, 8, 10, 2)), jnp.float32)
        flow = jnp.asarray(rng.normal(size=(1, 8, 10, 2)) * 1.5, jnp.float32)

        def loss(fn):
            return lambda a, b: jnp.sum(jnp.sin(fn(a, b)))

        gi_w, gf_w = jax.grad(loss(resample2d), (0, 1))(img, flow)
        gi_g, gf_g = jax.grad(loss(
            lambda a, b: resample2d(a, b, use_pallas=True, interpret=True,
                                    matmul=impl == "matmul")),
            (0, 1))(img, flow)
        np.testing.assert_allclose(np.asarray(gi_g), np.asarray(gi_w),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gf_w),
                                   rtol=1e-6, atol=1e-6)

        d_im = rng.normal(size=img.shape).astype(np.float32)
        d_fl = rng.normal(size=flow.shape).astype(np.float32)
        want = float(np.sum(np.asarray(gi_g) * d_im)
                     + np.sum(np.asarray(gf_g) * d_fl))
        eps = 1e-3
        f = loss(resample2d)
        fd = (float(f(img + eps * d_im, flow + eps * d_fl))
              - float(f(img - eps * d_im, flow - eps * d_fl))) / (2 * eps)
        np.testing.assert_allclose(want, fd, rtol=5e-3)


class TestChannelNormGather:
    @pytest.mark.smoke
    def test_channelnorm(self, rng):
        x = rng.normal(size=(2, 5, 6, 7)).astype(np.float32)
        got = np.asarray(channelnorm(x))
        want = np.sqrt((x ** 2).sum(-1, keepdims=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_flow_gather_bilinear(self):
        # DISTINCT channels (dx = x + 10y, dy = 2x + 5y) so an x/y output
        # channel swap or mixing bug is visible; gather between pixels
        flow = np.zeros((4, 4, 2), np.float32)
        for y in range(4):
            for x in range(4):
                flow[y, x] = (x + 10 * y, 2 * x + 5 * y)
        pts = np.array([[0.5, 0.0], [1.0, 1.5], [0.5, 0.5]], np.float32)
        got = np.asarray(flow_gather(flow, pts))
        np.testing.assert_allclose(got[:, 0], [0.5, 16.0, 5.5], atol=1e-5)
        np.testing.assert_allclose(got[:, 1], [1.0, 9.5, 3.5], atol=1e-5)
