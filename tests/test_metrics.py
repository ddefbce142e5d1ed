import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.metrics import (
    Classifier,
    FIDEvaluator,
    InceptionScore,
    MembershipLoss,
    TShirtClassifier,
    frechet_distance,
    inception_score_from_logits,
)
from siss_tpu.data import ArrayDataset


def test_inception_score_bounds():
    """Uniform logits → IS ≈ 1; one-hot confident + diverse → IS ≈ #classes."""
    n, c = 200, 10
    uniform = jnp.zeros((n, c))
    m, s = inception_score_from_logits(uniform, splits=10)
    np.testing.assert_allclose(float(m), 1.0, rtol=1e-4)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, c, n)
    confident = np.full((n, c), -20.0)
    confident[np.arange(n), labels] = 20.0
    m, s = inception_score_from_logits(jnp.asarray(confident), splits=10, key=jax.random.PRNGKey(0))
    assert float(m) > 7.0  # near 10 up to split-composition noise


def test_inception_score_remove_class():
    class StubClassifier:
        def compute_logits(self, imgs):
            # classify by mean intensity: bright → class 2
            means = np.asarray(imgs).mean(axis=(1, 2, 3))
            logits = np.zeros((len(means), 3))
            logits[means > 0.5, 2] = 10.0
            logits[means <= 0.5, 0] = 10.0
            return logits

    is_metric = InceptionScore(StubClassifier(), splits=3, remove_class=2)
    bright = np.ones((8, 4, 4, 1))
    dark = np.zeros((8, 4, 4, 1))
    is_metric.update(np.concatenate([bright, dark]))
    assert is_metric.logits[0].shape == (8, 2)  # brights dropped, column removed
    m, s = is_metric.compute(key=jax.random.PRNGKey(0))
    assert np.isfinite(m)


def test_tshirt_classifier():
    target = np.zeros((4, 4, 1), np.float32)
    imgs = np.stack([target, target + 0.01, np.ones_like(target)])
    freq, matches = TShirtClassifier.get_tshirt_frequency(imgs, target, threshold=1.0)
    np.testing.assert_allclose(freq, 2 / 3)
    assert matches.tolist() == [True, True, False]


def test_classifier_wrapper_batching():
    def apply_fn(params, x):
        return jnp.stack([x.mean(axis=(1, 2, 3)), -x.mean(axis=(1, 2, 3))], axis=1)

    clf = Classifier(apply_fn, {}, batch_size=4)
    imgs = np.random.default_rng(0).uniform(size=(10, 4, 4, 1)).astype(np.float32)
    logits = clf.compute_logits(imgs)
    assert logits.shape == (10, 2)
    freq = clf.compute_class_frequency(imgs + 1.0, 0)  # all positive mean → class 0
    assert freq == 1.0


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, sig = x.mean(0), np.cov(x, rowvar=False)
    assert frechet_distance(mu, sig, mu, sig) < 1e-6
    d = frechet_distance(mu, sig, mu + 1.0, sig)
    np.testing.assert_allclose(d, 8.0, rtol=0.01)  # ‖Δμ‖² = 8


def test_fid_evaluator_end_to_end():
    def feature_fn(imgs):
        x = jnp.asarray(imgs).reshape(imgs.shape[0], -1)
        return x[:, :8]

    rng = np.random.default_rng(1)
    real = rng.normal(0.5, 0.1, size=(256, 4, 4, 1)).astype(np.float32)
    fid = FIDEvaluator(feature_fn, real_images=real, inception_batch_size=64)
    fid.update(rng.normal(0.5, 0.1, size=(256, 4, 4, 1)).astype(np.float32))
    close, _ = fid.compute()
    fid.update(rng.normal(0.9, 0.3, size=(256, 4, 4, 1)).astype(np.float32))
    far, _ = fid.compute()
    assert far > close


def test_membership_loss_grid():
    """Linear model ⇒ membership loss has a closed form per (image, noise)
    pair; check the grid mean against a numpy loop."""
    sched = NoiseSchedule.create(100, "linear")

    def eps_apply(params, x, t, cond):
        return 0.5 * x

    images_a = np.random.default_rng(0).normal(size=(4, 4, 4, 1)).astype(np.float32)
    images_d = np.random.default_rng(1).normal(size=(2, 4, 4, 1)).astype(np.float32)
    ml = MembershipLoss(eps_apply, sched, ArrayDataset(images_a), ArrayDataset(images_d),
                        num_image_samples=3, num_noise_samples=5, eval_batch_size=7, seed=0)
    ml.sample_images()
    ml.sample_noises(key=jax.random.PRNGKey(2))
    out = ml.compute_membership_losses({}, timesteps=[10, 50])
    assert len(out) == 2

    # numpy check for t=10 on the 'all' set
    t = 10
    g, s = float(sched.gamma[t]), float(sched.sigma[t])
    noise = np.asarray(ml.noise)
    total = []
    for img in ml.all_images:
        for n in noise:
            noisy = g * img + s * n
            pred = 0.5 * noisy
            total.append(((pred - n) ** 2).sum())
    np.testing.assert_allclose(out[0][0], np.mean(total), rtol=1e-4)
