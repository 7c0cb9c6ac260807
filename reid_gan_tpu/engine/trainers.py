"""Cluster-contrast trainers as jitted functional train steps.

Parity: CC/clustercontrast/trainers.py:213-270 (ClusterContrastTrainer) — the
epoch loop semantics (IterLoader, per-iter memory InfoNCE, Adam step, meters)
are preserved; the compute is one fused jit program: device-side augmentation
→ encoder fwd/bwd → InfoNCE vs the replicated memory bank → optimizer update
→ sequential-equivalent bank update. Under a data mesh the batch is sharded
and XLA inserts the gradient psum (the DataParallel replacement,
SURVEY.md §5.8).
"""

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.cluster_memory import MemoryState, memory_loss, update_memory
from ..ops.transforms import reid_augment
from ..parallel.mesh import replicate, shard_batch
from ..utils import AverageMeter


class ReIDTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    memory: MemoryState
    step: jnp.ndarray


def make_optimizer(lr=3.5e-4, weight_decay=5e-4, step_size=20, iters_per_epoch=400,
                   gamma=0.1):
    """Adam + L2 weight decay + StepLR(step_size epochs, ×gamma), matching the
    reference recipe (CC/examples/cluster_contrast_train_usl.py: Adam 3.5e-4,
    wd 5e-4, StepLR 20). torch Adam couples wd into the gradient, so decay is
    added BEFORE the Adam moments."""

    def schedule(step):
        epoch = step // iters_per_epoch
        return lr * gamma ** (epoch // step_size)

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


class ClusterContrastTrainer:
    """USL trainer: per-epoch re-clustered memory bank + 400-iter InfoNCE loop
    (CC/clustercontrast/trainers.py:213-270)."""

    def __init__(self, model, height=256, width=128, temp=0.05, momentum=0.2,
                 use_hard=False, lr=3.5e-4, weight_decay=5e-4, step_size=20,
                 iters_per_epoch=400, num_instances=None, mesh=None):
        self.model = model
        self.mesh = mesh
        self.temp = temp
        self.momentum = momentum
        self.use_hard = use_hard
        self.num_instances = num_instances  # sampler P×K bound → fast bank fold
        self.tx = make_optimizer(lr, weight_decay, step_size, iters_per_epoch)

        def step_fn(state, img_u8, targets, seed):
            x = reid_augment(jax.random.PRNGKey(seed), img_u8, height=height,
                             width=width, train=True)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"])
                losses, _ = memory_loss(out["feat"], targets, state.memory,
                                        temp=self.temp)
                return losses.mean(), (mut["batch_stats"], out["feat"])

            (loss, (batch_stats, feats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            memory = update_memory(state.memory, feats, targets,
                                   momentum=self.momentum, use_hard=self.use_hard,
                                   group_size=self.num_instances)
            return ReIDTrainState(params, batch_stats, opt_state, memory,
                                  state.step + 1), loss

        self._step = jax.jit(step_fn, donate_argnums=(0,))

    def init_state(self, variables, memory):
        params = variables["params"]
        state = ReIDTrainState(
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(params),
            memory=memory,
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    def set_memory(self, state, memory):
        """Swap in the freshly re-clustered bank at epoch start
        (CC/examples/...usl.py:357-372 rebuilds ClusterMemory per epoch)."""
        if self.mesh is not None:
            memory = replicate(self.mesh, memory)
        return state._replace(memory=memory)

    def train(self, state, epoch, data_loader, train_iters=400, print_freq=10,
              base_seed=0):
        """Run one epoch; returns (state, mean_loss).

        The loop never syncs per iteration: losses stay on device and are
        fetched in ONE transfer at each print point, so host staging of the
        next batch overlaps device compute (a per-iter ``float()`` costs a
        full host↔device round trip and serializes the pipeline)."""
        batch_time = AverageMeter()
        data_time = AverageMeter()
        losses = AverageMeter()
        loss_buf = []
        end = window_start = time.time()
        for i in range(train_iters):
            batch = data_loader.next()
            data_time.update(time.time() - end)
            img, targets = batch["img"], batch["pid"].astype(np.int32)
            if self.mesh is not None:
                img, targets = shard_batch(self.mesh, (img, targets))
            seed = np.int32((base_seed + epoch * train_iters + i)
                            & 0x7FFFFFFF)
            state, loss = self._step(state, img, targets, seed)
            loss_buf.append(loss)
            end = time.time()
            if (i + 1) % print_freq == 0:
                vals = np.asarray(jnp.stack(loss_buf))   # one device sync
                loss_buf = []
                for v in vals:
                    losses.update(float(v))
                now = time.time()
                batch_time.update((now - window_start) / print_freq,
                                  n=print_freq)
                window_start = end = now
                print(f"Epoch: [{epoch}][{i + 1}/{train_iters}]\t"
                      f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                      f"Data {data_time.val:.3f} ({data_time.avg:.3f})\t"
                      f"Loss {losses.val:.3f} ({losses.avg:.3f})")
        for v in np.asarray(jnp.stack(loss_buf)) if loss_buf else []:
            losses.update(float(v))
        return state, losses.avg
