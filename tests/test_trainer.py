"""ClusterContrastTrainer: smoke training + sharded-vs-single-device
equivalence of the full train step (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reid_gan_tpu.engine.trainers import ClusterContrastTrainer
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.ops.cluster_memory import init_memory


class FakeIterLoader:
    def __init__(self, batches):
        self.batches = batches
        self.i = 0

    def next(self):
        b = self.batches[self.i % len(self.batches)]
        self.i += 1
        return b


def _make(mesh=None, seed=0, k=4, b=8):
    rng = np.random.RandomState(seed)
    model = create_model("resnet18", norm=True)
    x = jnp.zeros((b, 32, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    centers = rng.randn(k, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    memory = init_memory(centers, k_pad=8)
    trainer = ClusterContrastTrainer(model, height=32, width=16,
                                     iters_per_epoch=4, mesh=mesh)
    state = trainer.init_state(variables, memory)
    batches = [{"img": rng.randint(0, 256, (b, 32, 16, 3), dtype=np.uint8),
                "pid": rng.randint(0, k, b)} for _ in range(3)]
    return trainer, state, batches


def test_loss_decreases_on_repeated_batch():
    trainer, state, batches = _make()
    loader = FakeIterLoader(batches[:1])
    state, first = trainer.train(state, 0, loader, train_iters=1, print_freq=100)
    for _ in range(6):
        state, last = trainer.train(state, 0, loader, train_iters=1, print_freq=100)
    assert last < first


def test_memory_bank_updates_and_stays_normalized():
    trainer, state, batches = _make()
    loader = FakeIterLoader(batches)
    before = np.asarray(state.memory.features).copy()
    state, _ = trainer.train(state, 0, loader, train_iters=3, print_freq=100)
    after = np.asarray(state.memory.features)
    assert not np.allclose(before[:4], after[:4])
    norms = np.linalg.norm(after[:4], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # padded rows untouched
    np.testing.assert_allclose(after[4:], before[4:])


def test_sharded_step_matches_single_device(mesh):
    t1, s1, batches = _make(mesh=None)
    t8, s8, _ = _make(mesh=mesh)
    loader1 = FakeIterLoader(batches)
    loader8 = FakeIterLoader(batches)
    s1, l1 = t1.train(s1, 0, loader1, train_iters=2, print_freq=100)
    s8, l8 = t8.train(s8, 0, loader8, train_iters=2, print_freq=100)
    assert abs(l1 - l8) < 1e-4
    f1 = np.asarray(s1.memory.features)
    f8 = np.asarray(s8.memory.features)
    np.testing.assert_allclose(f1, f8, atol=1e-4)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_use_hard_trainer_runs():
    rng = np.random.RandomState(0)
    model = create_model("resnet18", norm=True)
    x = jnp.zeros((8, 32, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    centers = rng.randn(4, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastTrainer(model, height=32, width=16, use_hard=True,
                                     iters_per_epoch=4)
    state = trainer.init_state(variables, init_memory(centers))
    loader = FakeIterLoader([{"img": rng.randint(0, 256, (8, 32, 16, 3), dtype=np.uint8),
                              "pid": rng.randint(0, 4, 8)}])
    state, loss = trainer.train(state, 0, loader, train_iters=2, print_freq=100)
    assert np.isfinite(loss)
