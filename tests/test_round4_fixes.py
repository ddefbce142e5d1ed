"""Round-4 fixes (ADVICE r3): step_frequency metric gates survive
``steps_per_call`` folding, and the native CLIP tokenizer degrades
gracefully instead of aborting task startup.
"""

import json
import os

from siss_tpu.tasks.base import boundary_crossed


def test_boundary_crossed_reduces_to_modulo_per_step():
    """With prev = step-1 the gate is exactly ``step % every == 0``
    (the unfolded loop's historical behavior, including step 0)."""
    for every in (1, 3, 5, 30):
        for step in range(0, 100):
            assert boundary_crossed(step - 1, step, every) == (step % every == 0)


def test_boundary_crossed_fires_across_folded_boundaries():
    """ADVICE r3 (medium): sampling_steps=10, steps_per_call=4 visits
    steps 12, 20, 32, ... — a gate with step_frequency=30 must fire on
    the visit that crosses 30 (32), not wait for an exact multiple."""
    sampling_steps, K, freq = 10, 4, 30
    visits, prev = [], 0
    fired_at = []
    for step in range(K, 240 + 1, K):
        if boundary_crossed(prev, step, sampling_steps):
            visits.append((prev, step))
            if boundary_crossed(prev, step, freq):
                fired_at.append(step)
        prev = step
    # metric visits happen at 12, 20, 32, 40, 52, 60, ... none of which
    # is a multiple of 30 — yet every crossing of 30/60/90/... fires once
    assert visits[:3] == [(8, 12), (16, 20), (28, 32)]
    assert fired_at == [32, 60, 92, 120, 152, 180, 212, 240]


def test_boundary_crossed_disabled_gates():
    assert not boundary_crossed(0, 10, 0)
    assert not boundary_crossed(0, 10, None)


def test_async_checkpointing_roundtrip(tmp_path):
    """async_save: the write happens on the worker; wait() drains; the
    bundle restores identically and rotation still applies."""
    import jax
    import jax.numpy as jnp

    from siss_tpu.utils import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), total_limit=2, async_save=True)
    tree = {"w": jnp.arange(8, dtype=jnp.float32), "b": jnp.ones((3,))}
    for step in (1, 2, 3):
        mgr.save_bundle(step, {"unet": jax.tree.map(lambda x: x * step, tree)})
    mgr.wait()
    names = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint-"))
    assert names == ["checkpoint-2", "checkpoint-3"]  # rotation kept 2
    restored = mgr.restore_item("latest", "unet", tree)
    assert float(restored["w"][1]) == 3.0
    # a second wait() is a no-op; errors propagate on wait
    mgr.wait()
    mgr._submit(lambda: (_ for _ in ()).throw(RuntimeError("disk full")))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="disk full"):
        mgr.wait()


def test_native_tokenizer_failure_degrades(tmp_path, capsys):
    """ADVICE r3 (low): malformed vocab.json/merges.txt must fall through
    to the HF / embeddings-only path (None here), not raise at startup."""
    (tmp_path / "vocab.json").write_text("{not json")
    (tmp_path / "merges.txt").write_text("#version\n")
    from siss_tpu.models.clip_text import load_clip_tokenizer

    tok = load_clip_tokenizer(str(tmp_path))
    assert tok is None
    assert "falling back" in capsys.readouterr().out
