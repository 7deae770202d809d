"""Checkpoint/resume tests (SURVEY.md §5: tile-checkpoint restart)."""

import numpy as np

from zraytrace_tpu.checkpoint import (
    RenderCheckpoint,
    load_checkpoint,
    render_checkpointed,
    save_checkpoint,
)
from zraytrace_tpu.config import RenderParams


def _scene():
    from tests.test_render import _mini_scene

    return _mini_scene()


def test_save_load_roundtrip(tmp_path):
    ck = RenderCheckpoint(
        pixel_sum=np.random.default_rng(0).random((16, 3)),
        counters=np.arange(12, dtype=np.uint64).reshape(6, 2),
        samples_done=7, width=4, height=4, seed=42, max_depth=5,
    )
    p = tmp_path / "ck.npz"
    save_checkpoint(p, ck)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back.pixel_sum, ck.pixel_sum)
    np.testing.assert_array_equal(back.counters, ck.counters)
    assert back.samples_done == 7 and back.seed == 42


def test_resume_bit_identical(tmp_path):
    scene, camera = _scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=6, max_depth=4)

    # Uninterrupted checkpointed render.
    p1 = tmp_path / "full.npz"
    img_full, stats_full = render_checkpointed(scene, camera, params, p1, chunk_spp=2)

    # Interrupted: run only the first chunk (spp=2), then resume to 6.
    p2 = tmp_path / "resume.npz"
    partial = RenderParams(width=8, height=8, samples_per_pixel=2, max_depth=4)
    render_checkpointed(scene, camera, partial, p2, chunk_spp=2)
    assert load_checkpoint(p2).samples_done == 2
    img_res, stats_res = render_checkpointed(scene, camera, params, p2, chunk_spp=2)

    np.testing.assert_array_equal(img_full, img_res)
    assert stats_full.rays == stats_res.rays
    assert stats_res.samples == 8 * 8 * 6


def test_mismatched_config_rejected(tmp_path):
    scene, camera = _scene()
    p = tmp_path / "ck.npz"
    render_checkpointed(
        scene, camera,
        RenderParams(width=8, height=8, samples_per_pixel=2, max_depth=4),
        p, chunk_spp=2,
    )
    import pytest

    with pytest.raises(ValueError):
        render_checkpointed(
            scene, camera,
            RenderParams(width=8, height=8, samples_per_pixel=4, max_depth=3),
            p,
        )
