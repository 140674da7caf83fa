"""Training/eval harness.

Reference: trainer.py (class Trainer) + models/generic_reg_model.py.
Same outer semantics — niter<0 means epochs, per-step loss EMA display,
periodic summaries, validation-driven best-checkpoint selection on
`reg_success_final` (rot < thresh_rot, trans < thresh_trans), step-level
resilience (non-finite losses are skipped and counted) — but the inner
step is a single donated jit: forward + loss + grad + optimizer update
+ BN-stat update all compile into one XLA program. With a multi-device
mesh the batch is sharded on the 'data' axis and XLA inserts the
gradient all-reduce.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..geometry.se3 import se3_compare
from ..ops.pyramid import PyramidSpec
from ..parallel.mesh import batch_sharding, make_mesh, replicate_sharding
from ..utils.misc import StatsMeter, SummaryWriter, metrics_to_string, pretty_time_delta
from .checkpoint import CheckpointManager
from .scheduler import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, cfg, spec: PyramidSpec, example_batch,
                       seed: int = 0, abstract: bool = False,
                       init_on_cpu: bool = True):
    """Build the train state.

    abstract=True returns a ShapeDtypeStruct pytree (via eval_shape —
    no compile, no compute): the restore template for checkpoint
    loading at eval time.

    init_on_cpu=True runs the parameter initialization on the CPU
    backend and transfers — on this TPU a fresh XLA compile costs
    minutes, and init would compile the full forward just to produce
    random params."""
    def init_fn(batch):
        return model.init({"params": jax.random.PRNGKey(seed)},
                          batch, spec, train=False,
                          method=model.forward_with_loss)

    tx = make_optimizer(cfg)

    def to_state(variables):
        params = variables["params"]
        return TrainState(params=params,
                          batch_stats=variables.get("batch_stats", FrozenDict()),
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    if abstract:
        return jax.eval_shape(lambda: to_state(init_fn(example_batch))), tx

    cpu_devices = jax.devices("cpu") if init_on_cpu else []
    default = jax.devices()[0]
    if cpu_devices and cpu_devices[0].platform != default.platform:
        cpu = cpu_devices[0]
        with jax.default_device(cpu):
            host_batch = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), cpu), example_batch)
            state = to_state(init_fn(host_batch))
        return jax.device_put(state, default), tx
    return to_state(init_fn(example_batch)), tx


def make_train_step(model, tx, spec: PyramidSpec):
    """Fused train step with an in-graph non-finite guard.

    Reference trainer.py:137-149 skips a batch whose loss is
    non-finite and continues from the previous state. Doing that on the
    host would require a blocking sync every step AND is unsound with
    buffer donation (the old state's buffers are already invalidated
    once the step is dispatched). Instead the skip is part of the XLA
    program: if the loss is non-finite, every state leaf keeps its old
    value via a fused select — no sync, donation-safe, and unlike a
    host-side check it also protects against non-finite *gradients*
    with a finite loss. `losses["skipped"]` reports the outcome (0/1)."""
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            (_, losses), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, spec, train=True,
                method=model.forward_with_loss, mutable=["batch_stats"])
            return losses["total"], (losses, mut)

        grads, (losses, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads_ok = jax.tree.reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
            jnp.asarray(True))
        ok = jnp.isfinite(losses["total"]) & grads_ok
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        def keep_old(new, old):
            return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

        new_state = TrainState(
            params=keep_old(params, state.params),
            batch_stats=keep_old(mut.get("batch_stats", state.batch_stats),
                                 state.batch_stats),
            opt_state=keep_old(opt_state, state.opt_state),
            step=state.step + ok.astype(jnp.int32))
        losses = dict(losses)
        losses["skipped"] = (~ok).astype(jnp.float32)
        return new_state, losses

    return train_step


def make_eval_step(model, spec: PyramidSpec):
    @jax.jit
    def eval_step(state: TrainState, batch):
        pred, losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, spec, train=False, method=model.forward_with_loss)
        metrics = compute_pose_metrics(pred, batch)
        return pred, losses, metrics

    return eval_step


def device_prefetch(iterator, put_fn, size: int = 2):
    """Overlap host->device transfer with compute: keep `size` batches
    already transferred while the current step runs (the single-host
    analogue of flax.jax_utils.prefetch_to_device)."""
    import collections
    queue = collections.deque()
    for item in iterator:
        queue.append(put_fn(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def compute_pose_metrics(pred, batch):
    """Per-layer rot/trans errors vs GT (reference
    generic_reg_model.py:203-215 _compute_metrics over pose outputs)."""
    err = se3_compare(pred["pose"], batch["pose"][None])
    return {"rot_deg": err["rot_deg"], "trans": err["trans"]}  # (L, B)


class Trainer:
    def __init__(self, cfg, log_dir: str, niter: Optional[int] = None,
                 grad_clip: float = 0.0, summary_every: int = 500,
                 validate_every: int = -1, nb_sanity_val_steps: int = 2,
                 logger: Optional[logging.Logger] = None):
        self.cfg = cfg
        self.log_dir = log_dir
        self.niter = niter if niter is not None else cfg.get("niter", -100)
        self.summary_every = summary_every
        self.validate_every = validate_every
        self.nb_sanity_val_steps = nb_sanity_val_steps
        self.logger = logger or logging.getLogger("fgfusion.trainer")
        self.train_writer = SummaryWriter(f"{log_dir}/train")
        self.val_writer = SummaryWriter(f"{log_dir}/val")
        self.saver = CheckpointManager(f"{log_dir}/ckpt", max_to_keep=6)
        self.rot_th = cfg.get("reg_success_thresh_rot", 10)
        self.trans_th = cfg.get("reg_success_thresh_trans", 0.1)
        tp = int(cfg.get("tp_size", 1))
        if tp > 1:
            from ..parallel.tp import make_mesh_2d
            n_dev = len(jax.devices())
            assert n_dev % tp == 0, f"tp_size {tp} !| {n_dev} devices"
            self.mesh = make_mesh_2d(n_dev // tp, tp)
        else:
            self.mesh = make_mesh()
        self.tp = tp
        del grad_clip  # handled inside the optimizer (scheduler.make_optimizer)

    # ------------------------------------------------------------------
    def _put(self, batch: Dict[str, np.ndarray]):
        sh = batch_sharding(self.mesh)
        rep = replicate_sharding(self.mesh)
        out = {}
        n_data = self.mesh.shape["data"]
        for k, v in batch.items():
            if not isinstance(v, np.ndarray):
                continue
            out[k] = jax.device_put(
                v, sh if v.shape and v.shape[0] % n_data == 0 else rep)
        return out

    # ------------------------------------------------------------------
    def fit(self, model, spec: PyramidSpec, train_loader, val_loader,
            resume: Optional[str] = None):
        cfg = self.cfg
        first = next(iter(train_loader))
        state, tx = create_train_state(model, cfg, spec, self._put(first))
        if self.tp > 1:
            # Megatron-split the transformer weights over the 'model'
            # axis (parallel/tp.py); GSPMD handles the collectives.
            from ..parallel.tp import shard_tree
            state = shard_tree(state, self.mesh)
        if resume:
            saver = CheckpointManager(resume) if resume != self.saver.save_dir \
                else self.saver
            state, step0 = saver.load(state)
            self.logger.info("resumed from step %d", step0)

        train_step = make_train_step(model, tx, spec)
        eval_step = make_eval_step(model, spec)

        if self.niter < 0:
            total_iter = len(train_loader) * (-self.niter)
        else:
            total_iter = self.niter
        if self.validate_every < 0:
            validate_every = len(train_loader) * (-self.validate_every)
        else:
            validate_every = self.validate_every or len(train_loader)

        # sanity validation (reference trainer.py:83-85)
        if self.nb_sanity_val_steps > 0:
            self._validate(eval_step, state, val_loader,
                           limit=self.nb_sanity_val_steps, step=0, spec=spec)

        self.logger.info("training for %d steps (%s epochs of %d steps)",
                         total_iter,
                         -self.niter if self.niter < 0 else "?",
                         len(train_loader))

        step = int(state.step)
        loss_ema, ema_beta = None, 0.9
        n_skipped, skipped_acc = 0.0, None
        # donation hazard mitigation: keep a host snapshot so a step
        # that fails *after dispatch* (donated buffers already
        # invalidated) can restore instead of crashing on deleted
        # buffers. Updated for free at every validation/save (which
        # device_gets anyway) — a failure costs at most one
        # inter-validation span of progress; trace-time failures (no
        # dispatch yet) continue from the live state as the reference
        # does (trainer.py:137-149).
        host_snapshot = jax.device_get(state)
        snapshot_step = step
        step0, t_start = step, time.time()  # rate counts from resume point
        epoch = 0
        while step < total_iter:
            train_loader.set_epoch(epoch)
            for batch in device_prefetch(iter(train_loader), self._put):
                if step >= total_iter:
                    break
                try:
                    new_state, losses = train_step(state, batch)
                except Exception:  # noqa: BLE001
                    leaf = jax.tree.leaves(state.params)[0]
                    if getattr(leaf, "is_deleted", lambda: False)():
                        self.logger.exception(
                            "step %d raised after dispatch (donated buffers "
                            "gone); restoring snapshot from step %d",
                            step, snapshot_step)
                        state = jax.device_put(host_snapshot)
                        step = snapshot_step
                    else:
                        self.logger.exception(
                            "step %d raised before dispatch; skipping batch",
                            step)
                        step += 1
                    continue
                state = new_state
                step += 1
                # lazy device-side accumulation — no sync here
                skipped_acc = losses["skipped"] if skipped_acc is None \
                    else skipped_acc + losses["skipped"]

                # losses stay on device; materializing every step would
                # serialize dispatch (one blocking sync per step) and
                # defeat device_prefetch. Sync only at the log cadence.
                if step % 50 == 0:
                    total = float(losses["total"])
                    n_skipped = float(skipped_acc)
                    if np.isfinite(total):
                        loss_ema = total if loss_ema is None else \
                            ema_beta * loss_ema + (1 - ema_beta) * total
                    rate = (step - step0) / max(time.time() - t_start, 1e-9)
                    self.logger.info(
                        "step %d/%d | loss %.4f (ema %.4f) | %.2f it/s | eta %s",
                        step, total_iter, total, loss_ema or 0.0, rate,
                        pretty_time_delta((total_iter - step) / max(rate, 1e-9)))
                if step % self.summary_every == 0:
                    self.train_writer.add_scalars(
                        {k: float(v) for k, v in losses.items()}, step,
                        prefix="losses/")
                    self.train_writer.flush()
                if step % validate_every == 0:
                    score = self._validate(eval_step, state, val_loader, step=step)
                    host_snapshot = jax.device_get(state)
                    snapshot_step = step
                    self.saver.save(step, host_snapshot, score=score)
            epoch += 1

        score = self._validate(eval_step, state, val_loader, step=step)
        self.saver.save(step, jax.device_get(state), score=score)
        self.saver.wait()
        if skipped_acc is not None:
            n_skipped = float(skipped_acc)
        self.logger.info("done: %d steps, %d skipped, best score %.4f @ %s",
                         step, int(n_skipped), self.saver.best_score,
                         self.saver.best_step)
        return state

    # ------------------------------------------------------------------
    def test(self, model, spec: PyramidSpec, dataset, resume: str,
             benchmark_name: Optional[str] = None,
             gt_root: Optional[str] = None) -> Dict:
        """Test-set evaluation with dataset-specific protocol handling
        (reference Trainer.test trainer.py:185-217 +
        GenericRegModel.test_step/test_epoch_end
        generic_reg_model.py:128-201):

        - 3dmatch: write per-scene est.log files and run the official
          RR protocol against the shipped gt logs;
        - modelnet: accumulate RPMNet metrics + dump
          pred_transforms.npy;
        - mcd: write pose.log for evo conversion.

        Bucket ladder (cfg `eval_buckets`, e.g. [16384, 32768]): each
        pair is padded to the smallest bucket that fits BOTH clouds, so
        test fragments are never subsampled below their true size (the
        reference evaluates full clouds — its 30k cap is train-only,
        transforms.py:98). Each bucket jit-compiles its own program
        (minutes on this TPU, cached persistently), so buckets are
        created lazily and only sizes the data actually needs compile.
        """
        import os
        from ..data.buckets import collate_pairs
        from ..ops.pyramid import scale_spec

        cfg = self.cfg
        n0 = spec.capacities[0]
        buckets = sorted(int(b) for b in cfg.get("eval_buckets", [n0]))

        first = collate_pairs([dataset.__getitem__(0)], buckets[0])
        spec0 = scale_spec(spec, buckets[0])
        state, tx = create_train_state(model, cfg, spec0, self._put(first),
                                       abstract=True)
        saver = CheckpointManager(resume)
        state, step0 = saver.load(state, best=True)
        self.logger.info("testing with checkpoint step %d", step0)

        eval_steps: Dict[int, Any] = {}

        def step_for(n_points: int):
            b = next((bb for bb in buckets if bb >= n_points), buckets[-1])
            if b not in eval_steps:
                self.logger.info("eval bucket %d: compiling", b)
                eval_steps[b] = make_eval_step(model, scale_spec(spec, b))
            return b, eval_steps[b]

        stats = StatsMeter()
        modelnet_metrics = []
        modelnet_poses = []
        n_subsampled = 0
        t0 = time.time()
        for idx in range(len(dataset)):
            sample = dataset.__getitem__(idx)
            n_need = max(len(sample["src_xyz"]), len(sample["tgt_xyz"]))
            bucket, eval_step = step_for(n_need)
            if n_need > bucket:
                n_subsampled += 1
            batch = collate_pairs([sample], bucket)
            pred, losses, metrics = eval_step(state, self._put(batch))
            stats.update_dict({k: float(v) for k, v in losses.items()})
            rot = np.asarray(metrics["rot_deg"])
            trans = np.asarray(metrics["trans"])
            stats.update("rot_err_deg_final", float(rot[-1].mean()))
            stats.update("trans_err_final", float(trans[-1].mean()))
            success = (rot[-1] < self.rot_th) & (trans[-1] < self.trans_th)
            stats.update("reg_success_final", float(success.mean()))

            pose_final = np.asarray(pred["pose"])[-1, 0]          # (3, 4)
            pose44 = np.concatenate([pose_final, [[0, 0, 0, 1]]], axis=0)

            if cfg["dataset"] in ("3dmatch", "MCD_KTH"):
                # MCD_KTH reuses the 3DMatch-style est.log + RR protocol
                # (reference generic_reg_model.py:183-189)
                from ..benchmark.benchmark_3dmatch_rr import write_est_log
                scene = sample["src_path"].split(os.path.sep)[1]
                src_idx = int(os.path.basename(sample["src_path"])
                              .split("_")[-1].replace(".pth", ""))
                tgt_idx = int(os.path.basename(sample["tgt_path"])
                              .split("_")[-1].replace(".pth", ""))
                log_path = os.path.join(self.log_dir, benchmark_name, scene,
                                        "est.log")
                write_est_log(log_path, [(tgt_idx, src_idx, -1)], pose44[None])
            elif cfg["dataset"] == "modelnet":
                from ..benchmark import benchmark_modelnet as bm
                m = bm.compute_metrics(
                    batch["pose"], pose_final[None],
                    batch["src_xyz"], batch["tgt_xyz"],
                    np.asarray(sample["tgt_raw"])[None],
                    batch["src_mask"], batch["tgt_mask"])
                modelnet_metrics.append(m)
                modelnet_poses.append(pose_final)

            if (idx + 1) % 100 == 0:
                rate = (idx + 1) / (time.time() - t0)
                self.logger.info("test %d/%d (%.2f pairs/s)",
                                 idx + 1, len(dataset), rate)

        avgs = stats.avgs()
        self.logger.info(metrics_to_string(avgs, "[test] "))
        if n_subsampled:
            self.logger.warning(
                "%d/%d pairs exceeded the largest eval bucket (%d) and "
                "were subsampled — add a larger bucket to eval_buckets "
                "for full protocol fidelity", n_subsampled, len(dataset),
                buckets[-1])
        results: Dict = {"metrics": avgs,
                         "pairs_per_sec": len(dataset) / (time.time() - t0),
                         "n_subsampled": n_subsampled}

        if cfg["dataset"] in ("3dmatch", "MCD_KTH"):
            from ..benchmark.benchmark_3dmatch_rr import benchmark
            if gt_root is None:
                # gt.log/gt.info live next to the dataset infos — for
                # the synthetic stand-in that is info_dir/benchmarks,
                # same layout as the real Predator root.
                gt_root = os.path.join(
                    cfg.get("info_dir", "datasets/3dmatch"), "benchmarks")
            report, mean_recall = benchmark(
                os.path.join(self.log_dir, benchmark_name),
                os.path.join(gt_root, benchmark_name))
            self.logger.info("\n%s", report)
            results["registration_recall"] = mean_recall
            results["report"] = report
        elif cfg["dataset"] == "modelnet":
            from ..benchmark import benchmark_modelnet as bm
            cat = {k: np.concatenate([m[k] for m in modelnet_metrics])
                   for k in modelnet_metrics[0]}
            summary = bm.summarize_metrics(cat)
            bm.print_metrics(self.logger, summary)
            np.save(os.path.join(self.log_dir, "pred_transforms.npy"),
                    np.stack(modelnet_poses))
            results["summary"] = summary
        return results

    # ------------------------------------------------------------------
    def _validate(self, eval_step, state, val_loader, step: int = 0,
                  limit: Optional[int] = None, spec: Optional[PyramidSpec] = None)\
            -> float:
        stats = StatsMeter()
        for i, batch in enumerate(val_loader):
            if limit is not None and i >= limit:
                break
            pred, losses, metrics = eval_step(state, self._put(batch))
            if i == 0 and spec is not None and "n_voxels" in pred:
                nv = np.asarray(pred["n_voxels"])       # (levels-1, C)
                for lvl in range(nv.shape[0]):
                    cap = spec.capacities[lvl + 1]
                    worst = int(nv[lvl].max()) if nv.size else 0
                    if worst > cap:
                        self.logger.warning(
                            "pyramid level %d overflow: %d voxels > capacity "
                            "%d (points dropped; recalibrate capacities)",
                            lvl + 1, worst, cap)
            stats.update_dict({k: float(v) for k, v in losses.items()})
            rot = np.asarray(metrics["rot_deg"])    # (L, B)
            trans = np.asarray(metrics["trans"])
            n_layers = rot.shape[0]
            for l in range(n_layers):
                stats.update(f"rot_err_{l}", float(rot[l].mean()), rot.shape[1])
                stats.update(f"trans_err_{l}", float(trans[l].mean()), rot.shape[1])
            success = (rot[-1] < self.rot_th) & (trans[-1] < self.trans_th)
            stats.update("reg_success_final", float(success.mean()), rot.shape[1])
        avgs = stats.avgs()
        self.logger.info(metrics_to_string(avgs, f"[val @ {step}] "))
        self.val_writer.add_scalars(avgs, step, prefix="val/")
        self.val_writer.flush()
        return avgs.get("reg_success_final", 0.0)
