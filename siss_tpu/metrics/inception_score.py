"""Inception Score over an arbitrary classifier's logits, with
``remove_class`` support.

Re-implementation of the reference's torchmetrics-adapted IS
(``metrics/inception_score.py:16-63``): images whose argmax prediction is
the removed class are dropped AND the class column is removed — this is how
MNIST sample quality is scored with a 10-digit classifier while the t-shirt
(class 10) is being unlearned. The split-KL computation is a pure jnp
function; the stateful accumulator mirrors the update/compute surface.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score_from_logits(
    logits: jax.Array, splits: int = 10, key: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """exp(E KL(p(y|x) ‖ p(y))) per split → (mean, std)."""
    n = logits.shape[0]
    if key is not None:
        perm = jax.random.permutation(key, n)
        logits = logits[perm]
    prob = jax.nn.softmax(logits, axis=1)
    log_prob = jax.nn.log_softmax(logits, axis=1)
    # torch.chunk semantics: first splits get ceil(n/splits)
    chunk = -(-n // splits)
    scores = []
    for i in range(splits):
        p = prob[i * chunk:(i + 1) * chunk]
        lp = log_prob[i * chunk:(i + 1) * chunk]
        if p.shape[0] == 0:
            continue
        mean_p = p.mean(axis=0, keepdims=True)
        kl = (p * (lp - jnp.log(mean_p))).sum(axis=1).mean()
        scores.append(jnp.exp(kl))
    kl = jnp.stack(scores)
    std = kl.std(ddof=1) if len(scores) > 1 else jnp.zeros(())
    return kl.mean(), std


class InceptionScore:
    """Stateful accumulator (update/compute) like the reference class."""

    def __init__(self, classifier, splits: int = 10, remove_class: Optional[int] = None):
        # reference drops one split when a class is removed (``:18``)
        self.splits = splits if remove_class is None else splits - 1
        self.remove_class = remove_class
        self.classifier = classifier
        self.logits: List[np.ndarray] = []

    def update(self, imgs):
        """imgs: [N,H,W,C] float in [0,1]."""
        logits = np.asarray(self.classifier.compute_logits(imgs))
        if self.remove_class is not None:
            keep = logits.argmax(-1) != self.remove_class
            logits = logits[keep]
            cols = np.arange(logits.shape[-1]) != self.remove_class
            logits = logits[:, cols]
        self.logits.append(logits)

    def compute(self, key: Optional[jax.Array] = None) -> Tuple[float, float]:
        logits = np.concatenate(self.logits, axis=0)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        mean, std = inception_score_from_logits(jnp.asarray(logits), self.splits, key)
        self.logits = []
        return float(mean), float(std)
