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


def test_optimizer_builder_adafactor_state_is_factored():
    """`optimizer._target_: adafactor` (round-4 SD memory lever): factored
    second moments mean the optimizer state for an (R, C) matrix stores
    O(R+C) — not O(R*C) like Adam — freeing ~6.9G on SD-1.x so
    microbatch>1 fits a single chip (BASELINE.md round-4 SD table)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    tx = build_optimizer(Config({"_target_": "adafactor", "lr": 1e-5,
                                 "weight_decay": 1e-2}))
    params = {"w": jnp.zeros((256, 512), jnp.float32),
              "b": jnp.zeros((512,), jnp.float32)}
    state = tx.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_state = sum(np.asarray(x).size for x in jax.tree.leaves(state))
    assert n_state < n_params // 16, (n_state, n_params)

    g = jax.tree.map(lambda x: jnp.full_like(x, 0.1), params)
    u, state = tx.update(g, state, params)
    new = optax.apply_updates(params, u)
    flat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(new)])
    assert np.isfinite(flat).all()
    # descent direction: params move against the (all-positive) gradient
    assert float(np.asarray(new["w"]).mean()) < 0.0


def test_optimizer_builder_adafactor_rejects_adam_dtype_knobs():
    import pytest

    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    with pytest.raises(ValueError, match="adafactor"):
        build_optimizer(Config({"_target_": "adafactor", "lr": 1e-5,
                                "mu_dtype": "bfloat16"}))


def test_deletion_step_runs_with_adafactor():
    """The surgery train step (scan accumulators + donation) composes with
    adafactor's factored optimizer state — the state pytree round-trips
    through the jitted step and the update is finite and non-zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from siss_tpu.config import Config
    from siss_tpu.diffusion import NoiseSchedule
    from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step
    from siss_tpu.train.optim import build_optimizer

    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.full((4, 8), 0.5), "b": jnp.zeros((8,))}

    def apply_fn(p, x, t, cond):
        return x * p["w"].mean() + p["b"].mean()

    tx = build_optimizer(Config({"_target_": "adafactor", "lr": 1e-2}))
    cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                             loss_params=(("lambd", 0.5),), scaling_norm=5.0,
                             grad_accum_steps=2, t_min=0, t_max=100,
                             fused_siss=False)
    step = jax.jit(build_deletion_train_step(apply_fn, sched, tx, cfg))
    state = TrainState.create(params, tx)
    rng = np.random.default_rng(3)
    batch = {
        "all": jnp.asarray(rng.normal(size=(2, 2, 4, 4, 1)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(2, 2, 4, 4, 1)), jnp.float32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), {})
    assert np.isfinite(float(metrics["gradient/norm_loss_a"]))
    assert not np.allclose(np.asarray(new_state.params["w"]),
                           np.asarray(state.params["w"]))
    # one more step with the carried state (exercises factored-state update)
    new_state2, _ = step(new_state, batch, jax.random.PRNGKey(1), {})
    assert np.isfinite(np.asarray(new_state2.params["w"])).all()


def test_shard_state_handles_factored_adafactor_leaves():
    """`shard_state` on a tensor-axis mesh must not index out of range on
    adafactor's factored v_row/v_col leaves, which carry the parameter's
    path names (e.g. to_q/kernel) at lower rank."""
    import jax.numpy as jnp

    from siss_tpu.config import Config
    from siss_tpu.parallel import MeshConfig, make_mesh
    from siss_tpu.parallel.mesh import shard_state
    from siss_tpu.train import TrainState
    from siss_tpu.train.optim import build_optimizer

    params = {"attn": {"to_q": {"kernel": jnp.zeros((256, 256))}},
              "ff": {"geglu_proj": {"kernel": jnp.zeros((256, 1024)),
                                    "bias": jnp.zeros((1024,))}}}
    tx = build_optimizer(Config({"_target_": "adafactor", "lr": 1e-3}))
    state = TrainState.create(params, tx)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_state(state, mesh)  # must not raise
    assert sharded.params["attn"]["to_q"]["kernel"].shape == (256, 256)
