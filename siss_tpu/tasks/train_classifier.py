"""Metric-classifier training (replaces the reference's
``notebooks/cnn-resnet18-mnist.ipynb`` manual workflow with a Task).

Trains the grayscale ResNet-18 digit classifier used by the Inception-Score
and class-fraction metrics (``metrics/mnist_resnet.py`` role) and saves an
orbax checkpoint the ``Classifier`` wrapper loads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siss_tpu.data import InfiniteSampler
from siss_tpu.models.resnet import resnet18
from siss_tpu.tasks.base import Task
from siss_tpu.utils import CheckpointManager


class TrainClassifier(Task):
    def run(self) -> None:
        cfg = self.cfg
        tracker = self.make_tracker()
        key = jax.random.PRNGKey(int(cfg.random_seed))

        dataset = self.build_dataset(cfg.dataset)
        num_classes = int(cfg.get("num_classes", 10))
        model = resnet18(num_classes=num_classes, grayscale=True)

        images, labels = dataset.images, dataset.labels
        # train on [0,1]-range images like the metric inputs
        x0 = (np.asarray(dataset[0]) + 1.0) / 2.0 if dataset.normalize else np.asarray(dataset[0])
        variables = model.init(key, jnp.zeros((1, *x0.shape)), train=True)
        tx = optax.adamw(float(cfg.get("lr", 1e-3)))
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(variables, opt_state, batch, targets):
            def loss_fn(params):
                logits, mutated = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    batch, train=True, mutable=["batch_stats"])
                loss = optax.softmax_cross_entropy_with_integer_labels(logits, targets).mean()
                acc = (logits.argmax(-1) == targets).mean()
                return loss, (mutated["batch_stats"], acc)

            (loss, (bstats, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params, "batch_stats": bstats}, opt_state, loss, acc

        bs = int(cfg.get("train_batch_size", 256))
        steps = int(cfg.get("training_steps", 1000))
        sampler = iter(InfiniteSampler(len(dataset), seed=int(cfg.random_seed)))
        for i in range(steps):
            idx = [next(sampler) for _ in range(bs)]
            batch = jnp.asarray(np.stack([(np.asarray(dataset[j]) + 1.0) / 2.0 for j in idx]))
            targets = jnp.asarray(labels[idx])
            variables, opt_state, loss, acc = step(variables, opt_state, batch, targets)
            if i % 100 == 0:
                tracker.log({"loss": loss, "accuracy": acc}, step=i)

        ckpt = CheckpointManager(str(cfg.output_dir))
        ckpt.save(steps, variables)
        tracker.log({"final_accuracy": acc}, step=steps)
        tracker.finish()
