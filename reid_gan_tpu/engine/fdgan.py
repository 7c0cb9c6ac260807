"""FD-GAN engines: the stage-I Siamese verification trainer and the two-stage
CascadeEvaluator.

Parity:
- SiameseTrainer (FD/reid/trainers.py:19-73): CE on the verification logits of
  (anchor, pos/neg) pairs from RandomPairSampler, SGD momentum, lr ×0.1 every
  step_size epochs (FD/baseline.py:126-143).
- CascadeEvaluator (FD/reid/evaluators.py:183-228): stage 1 global-feature
  distmat + evaluate_all (allshots/cuhk03/market1501 CMC); stage 2 re-scores
  the top-k gallery of each query with the Siamese verifier (softmax prob of
  'different' as distance, FD/baseline.py:104-106) and pushes the tail beyond
  a gap. The reference loops queries one GPU call at a time
  (evaluators.py:28-31); here all m×k pairs run as one batched jit program.
"""

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.transforms import normalize, random_erasing, random_hflip, to_float
from ..utils import AverageMeter
from .evaluators import extract_features as _extract
from .metrics import accuracy, cmc, rank_metrics


class SiameseTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def fd_train_augment(key, img_u8):
    """FD default train transform (FD/reid/utils/data/preprocessor.py:25-31):
    RectScale (host) → RandomSizedEarser (random RGB fill) → flip → normalize."""
    ke, kf, kc = jax.random.split(key, 3)
    x = to_float(img_u8)
    fill = jax.random.uniform(kc, (x.shape[0], 1, 1, 3))
    x = random_erasing(ke, x, p=0.5, sl=0.02, sh=0.2, r1=0.3, fill=fill)
    x, _ = random_hflip(kf, x)
    return normalize(x)


class SiameseTrainer:
    """Stage-I supervised verification baseline."""

    def __init__(self, model, lr=0.01, momentum=0.9, weight_decay=5e-4,
                 step_size=40, iters_per_epoch=None, mesh=None):
        self.model = model
        self.mesh = mesh   # DataParallel replacement (FD/baseline.py:100)
        self.base_lr = lr
        self.step_size = step_size
        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(learning_rate, momentum=momentum)))(learning_rate=lr)

        def step_fn(state, img1, img2, targets, key):
            k1, k2 = jax.random.split(key)
            x1 = fd_train_augment(k1, img1)
            x2 = fd_train_augment(k2, img2)

            def loss_fn(params):
                (f1, f2, logits), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x1, x2, train=True, mutable=["batch_stats"])
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, targets).mean()
                return loss, (mut["batch_stats"], logits)

            (loss, (bs, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return SiameseTrainState(params, bs, opt_state, state.step + 1), \
                loss, logits

        self._step = jax.jit(step_fn, donate_argnums=(0,))

    def init_state(self, variables):
        state = SiameseTrainState(variables["params"],
                                  variables["batch_stats"],
                                  self.tx.init(variables["params"]),
                                  jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            state = replicate(self.mesh, state)
        return state

    def adjust_lr(self, state, epoch):
        """lr = base · 0.1^(epoch // step_size) (FD/baseline.py:135-139).
        FUNCTIONAL: returns a new state."""
        lr = self.base_lr * 0.1 ** (epoch // self.step_size)
        opt = state.opt_state._replace(hyperparams=dict(
            state.opt_state.hyperparams, learning_rate=jnp.asarray(lr)))
        return state._replace(opt_state=opt)

    def train(self, state, epoch, data_loader, print_freq=1, base_seed=0):
        """No per-iter device syncs: loss/logits stay on device and are
        fetched in one batched ``jax.device_get`` per print window so host
        staging overlaps device compute."""
        batch_time, data_time = AverageMeter(), AverageMeter()
        losses, precisions = AverageMeter(), AverageMeter()
        buf = []          # (loss_dev, logits_dev, targets_host)

        def drain(buf):
            if not buf:
                return
            fetched = jax.device_get([(l, g) for l, g, _ in buf])  # one sync
            for (loss_v, logits_v), (_, _, tgt) in zip(fetched, buf):
                prec, = accuracy(logits_v, tgt)
                losses.update(float(loss_v), len(tgt))
                precisions.update(prec, len(tgt))

        end = window_start = time.time()
        state = self.adjust_lr(state, epoch)
        i = -1
        for i, (b1, b2) in enumerate(data_loader):
            data_time.update(time.time() - end)
            targets = (b1["pid"] == b2["pid"]).astype(np.int32)
            key = jax.random.PRNGKey(base_seed * 131071 + epoch * 8191 + i)
            img1, img2 = np.asarray(b1["img"]), np.asarray(b2["img"])
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                img1, img2, targets = shard_batch(
                    self.mesh, (img1, img2, targets))
            state, loss, logits = self._step(
                state, jnp.asarray(img1), jnp.asarray(img2),
                jnp.asarray(targets), key)
            buf.append((loss, logits, np.asarray(targets)))
            end = time.time()
            if (i + 1) % print_freq == 0:
                drain(buf)
                buf = []
                now = time.time()
                batch_time.update((now - window_start) / print_freq,
                                  n=print_freq)
                window_start = end = now
                print(f"Epoch: [{epoch}][{i + 1}]\t"
                      f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                      f"Data {data_time.val:.3f} ({data_time.avg:.3f})\t"
                      f"Loss {losses.val:.3f} ({losses.avg:.3f})\t"
                      f"Prec {precisions.val:.2%} ({precisions.avg:.2%})")
        drain(buf)
        return state, losses.avg


def fd_evaluate_all(distmat, query=None, gallery=None, cmc_topk=(1, 5, 10),
                    dataset=None, top1=True):
    """3-config CMC table (FD/reid/evaluators.py:101-181). allshots/market
    CMC and mAP come from fused rank passes (on-device with an accelerator);
    the cuhk03 random-sampling mode uses the vectorized 10-repeat sampler
    (metrics._sgs_rank_metrics_numpy)."""
    query_ids = [pid for _, pid, _ in query]
    gallery_ids = [pid for _, pid, _ in gallery]
    query_cams = [cam for _, _, cam in query]
    gallery_cams = [cam for _, _, cam in gallery]
    _, mAP = rank_metrics(distmat, query_ids, gallery_ids, query_cams,
                          gallery_cams, topk=1, backend="auto")
    print("Mean AP: {:4.1%}".format(mAP))
    if not top1:
        return mAP
    if not dataset:
        configs = {
            "allshots": dict(separate_camera_set=False,
                             single_gallery_shot=False, first_match_break=False),
            "cuhk03": dict(separate_camera_set=True,
                           single_gallery_shot=True, first_match_break=False),
            "market1501": dict(separate_camera_set=False,
                               single_gallery_shot=False, first_match_break=True),
        }
    elif dataset == "cuhk03":
        configs = {"cuhk03": dict(separate_camera_set=True,
                                  single_gallery_shot=True,
                                  first_match_break=False)}
    else:
        configs = {"market1501": dict(separate_camera_set=False,
                                      single_gallery_shot=False,
                                      first_match_break=True)}
    def one_cmc(params):
        if params.get("single_gallery_shot"):
            return cmc(distmat, query_ids, gallery_ids, query_cams,
                       gallery_cams, seed=0, **params)
        curve, _ = rank_metrics(
            distmat, query_ids, gallery_ids, query_cams, gallery_cams,
            separate_camera_set=params["separate_camera_set"],
            first_match_break=params["first_match_break"], backend="auto")
        return curve

    scores = {name: one_cmc(params) for name, params in configs.items()}
    names = list(configs)
    print("CMC Scores" + "".join(f"{n:>12}" for n in names))
    for k in cmc_topk:
        print("  top-{:<4}".format(k) +
              "".join(f"{scores[n][k - 1]:12.1%}" for n in names))
    if not dataset:
        return scores["allshots"][0]
    return scores[names[0]][0], mAP


class CascadeEvaluator:
    """Two-stage evaluation (FD/reid/evaluators.py:183-228)."""

    def __init__(self, extractor, embed_model, embed_params,
                 embed_batch_stats, embed_dist_fn="softmax0"):
        self.extractor = extractor
        self.embed_model = embed_model
        self.embed_vars = {"params": embed_params,
                           "batch_stats": embed_batch_stats}
        self.embed_dist_fn = embed_dist_fn

        @jax.jit
        def _embed(variables, probe, gallery):
            logits = embed_model.apply(variables, probe, gallery, train=False)
            if embed_dist_fn == "softmax0":
                return jax.nn.softmax(logits, axis=1)[:, 0]
            return logits[:, 0]

        self._embed = _embed

    def set_variables(self, extractor_variables, embed_params,
                      embed_batch_stats):
        """Swap in fresh net weights without re-jitting either stage (both
        jitted programs take variables as traced arguments)."""
        self.extractor.variables = extractor_variables
        self.embed_vars = {"params": embed_params,
                           "batch_stats": embed_batch_stats}

    def evaluate(self, data_loader, query, gallery, rerank_topk=75,
                 second_stage=True, dataset=None, top1=True):
        features, _ = _extract(self.extractor, data_loader, print_freq=1 << 30)
        from .evaluators import pairwise_distance

        distmat, qf, gf = pairwise_distance(
            features, query, gallery,
            mesh=getattr(self.extractor, "mesh", None))
        print("First stage evaluation:")
        if second_stage:
            fd_evaluate_all(distmat, query=query, gallery=gallery,
                            dataset=dataset, top1=top1)
            m = len(query)
            # argpartition instead of a full row sort: only the top-k set and
            # the (k+1)-th boundary element are needed
            part = np.argpartition(distmat, (rerank_topk - 1, rerank_topk),
                                   axis=1)
            topk_idx = part[:, :rerank_topk]                       # (m, k)
            probe = np.repeat(qf, rerank_topk, axis=0)             # (m·k, D)
            gal = gf[topk_idx.reshape(-1)]                         # (m·k, D)
            scores = np.asarray(self._embed(self.embed_vars,
                                            jnp.asarray(probe),
                                            jnp.asarray(gal)))
            scores = scores.reshape(m, rerank_topk)
            # merge: replace top-k with verifier distance, push tail beyond
            # gap (evaluators.py:219-226) — vectorized over queries: after
            # the overwrite, bar == scores.max(row), the boundary value is
            # the (k+1)-th original distance, and the tail is everything
            # outside the top-k set
            nxt = np.take_along_axis(distmat, part[:, rerank_topk:rerank_topk + 1],
                                     axis=1)[:, 0]
            np.put_along_axis(distmat, topk_idx, scores, axis=1)
            gap = np.maximum(scores.max(axis=1) + 1.0 - nxt, 0.0)
            tail = np.ones(distmat.shape, bool)
            np.put_along_axis(tail, topk_idx, False, axis=1)
            distmat += gap[:, None] * tail
            print("Second stage evaluation:")
        return fd_evaluate_all(distmat, query=query, gallery=gallery,
                               dataset=dataset, top1=top1)
