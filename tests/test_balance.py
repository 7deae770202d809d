"""Profile-balanced lane assignment (balance.py + permuted_base).

The balanced map moves pixel windows between lanes; it must never move
EVENTS: counters stay bit-exact vs the XLA wavefront, and the
unscrambled image equals the identity-map image up to float summation
order."""

import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.balance import balance_perm, orbit_sums
from zraytrace_tpu.ops.bounce_kernel3 import wavefront_trace_pallas3
from zraytrace_tpu.render import wavefront_trace
from zraytrace_tpu.scenes import three_balls

W, H, SPP, DEPTH = 16, 32, 4, 6
N, SLOTS, G = 256, 2, 2


def _unscramble(sums, base, n_pixels):
    """(slots, N, 3) lane sums -> (n_pixels, 3): lane l of stripe p is
    pixel base[l] + p*N."""
    s = np.asarray(sums)
    base = np.asarray(base)
    out = np.zeros((n_pixels, 3), s.dtype)
    for p in range(s.shape[0]):
        pix = base + p * base.shape[0]
        ok = pix < n_pixels
        out[pix[ok]] = s[p][ok]
    return out


def test_balance_perm_is_balanced_permutation():
    rng = np.random.default_rng(0)
    cost = rng.exponential(10.0, size=N)
    g = 8  # the production interleave depth: bins of 8 columns
    perm = balance_perm(cost, g)
    assert sorted(perm.tolist()) == list(range(N))
    t_new = orbit_sums(cost, perm, g)
    t_old = orbit_sums(cost, np.arange(N, dtype=np.int32), g)
    assert t_new.max() / t_new.mean() < t_old.max() / t_old.mean()
    # greedy largest-first with 8 items per bin lands near-perfect
    assert t_new.max() / t_new.mean() < 1.05


def test_permuted_base_counters_bitexact_and_image_matches():
    built = three_balls()
    base_id = jnp.arange(N, dtype=jnp.int32)
    sums_x, cnt_x = wavefront_trace(
        built.scene, built.camera, base_id, 42, W, H, SPP, DEPTH,
        0, None, N, W * H, SLOTS,
    )
    img_x = _unscramble(sums_x, base_id, W * H)

    rng = np.random.default_rng(1)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sums_p, cnt_p = wavefront_trace_pallas3(
        built.scene, built.camera, perm, 42, W, H, SPP, DEPTH,
        0, SLOTS, N, W * H, n_bounce=6, sample_groups=G,
        permuted_base=True,
    )
    img_p = _unscramble(sums_p, perm, W * H)

    np.testing.assert_array_equal(np.asarray(cnt_x)[:5],
                                  np.asarray(cnt_p)[:5])
    diff = np.abs(img_x - img_p)
    assert (diff > 1e-4).mean() < 0.05, diff.max()
    assert np.median(diff) < 1e-5


def test_permuted_identity_matches_analytic_interleave():
    """perm = arange must reproduce the analytic rotated-base schedule
    exactly (same windows on the same lanes -> bit-identical sums)."""
    built = three_balls()
    base_id = jnp.arange(N, dtype=jnp.int32)
    common = (built.scene, built.camera, base_id, 42, W, H, SPP, DEPTH,
              0, SLOTS, N, W * H)
    s_a, c_a = wavefront_trace_pallas3(
        *common, n_bounce=6, sample_groups=G)
    s_p, c_p = wavefront_trace_pallas3(
        *common, n_bounce=6, sample_groups=G, permuted_base=True)
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_p))
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_p))


def test_return_misses_counts_texel_slots():
    built = three_balls()
    base_id = jnp.arange(N, dtype=jnp.int32)
    out = wavefront_trace_pallas3(
        built.scene, built.camera, base_id, 42, W, H, SPP, DEPTH,
        0, SLOTS, N, W * H, n_bounce=6, sample_groups=1,
        return_misses=True,
    )
    assert len(out) == 3
    misses = np.asarray(out[2])
    assert misses.shape == (N,)
    assert misses.min() >= 0
    # the textured spheres are visible: someone must miss
    assert misses.sum() > 0


def test_render_decodes_permuted_base(monkeypatch):
    """END-TO-END: render() with a balanced (permuted) lane map must
    return the same IMAGE as the identity map — the decode has to invert
    the permutation (a missing inversion scrambles every pixel; caught
    on hardware, round 4)."""
    import zraytrace_tpu.balance as balance_mod
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.render import render

    built = three_balls()
    rng = np.random.default_rng(7)

    def fake_cached(scene, camera, w, h, depth, n_lanes, n_slots,
                    groups, **kw):
        return rng.permutation(n_lanes).astype(np.int32), None

    monkeypatch.setattr(balance_mod, "balanced_base_cached", fake_cached)
    rp = dict(width=16, height=16, samples_per_pixel=2, max_depth=4,
              use_pallas=True)
    img_id, st_id = render(built.scene, built.camera,
                           RenderParams(**rp, pallas_balance=False))
    img_p, st_p = render(built.scene, built.camera,
                         RenderParams(**rp, pallas_balance=True))
    assert st_id.rays == st_p.rays
    assert st_id.reflections == st_p.reflections
    diff = np.abs(np.asarray(img_id) - np.asarray(img_p))
    # same streams; texel-factor multiply order may deviate per pixel
    assert (diff > 1e-4).mean() < 0.05, float(diff.max())
    assert np.median(diff) < 1e-5


def test_unpermute_lanes_inverts_unscramble():
    from zraytrace_tpu.render import unpermute_lanes

    rng = np.random.default_rng(3)
    n, slots = 64, 3
    perm = rng.permutation(n).astype(np.int32)
    sums = rng.normal(size=(slots, n, 3)).astype(np.float32)
    out = unpermute_lanes(sums, perm).reshape(slots * n, 3)
    ref = _unscramble(sums, perm, slots * n)
    np.testing.assert_array_equal(out, ref)


def test_packed_record_slot_guard():
    """The packed record id (slot | mask << 16) limits the slot counter
    to 16 bits; configurations that would overflow it must be refused
    loudly, not silently corrupt records (round-4 review finding)."""
    import pytest

    built = three_balls()
    n_pix = 5000 * 4096  # 20.5M pixels at 256 lanes -> 80000 slots
    with pytest.raises(ValueError, match="16-bit packed"):
        wavefront_trace_pallas3(
            built.scene, built.camera, jnp.arange(256, dtype=jnp.int32),
            42, 4096, 5000, 1, 3, 0, 80000, 256, n_pix, n_bounce=4,
        )
