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


class GracefulStop:
    """Cooperative stop for deadline-harnessed TPU jobs.

    An abrupt kill mid-step has repeatedly wedged the TPU tunnel for
    hours (STATUS.md ops incidents), so long-running loops (fit, test)
    poll this instead: the first SIGTERM (what `timeout` sends) or the
    appearance of a stop file (`<log_dir>/STOP` or /tmp/fgfusion_stop)
    requests a clean exit after the current unit of work — the caller
    then writes final checkpoints/partial results. The graceful path is
    hard-bounded by a SIGALRM (process dies if the epilogue hangs); a
    second SIGTERM exits immediately."""

    def __init__(self, logger, log_dir: str, alarm_s: int = 900):
        import os
        self._logger = logger
        self._alarm_s = alarm_s
        self._files = (os.path.join(log_dir, "STOP"), "/tmp/fgfusion_stop")
        self._prev = None
        self.stopped = False

    def __enter__(self):
        import os
        import signal
        for p in self._files:  # a stale stop file must not kill a new run
            try:
                os.remove(p)
            except OSError:
                pass

        def _on_term(signum, frame):
            if self.stopped:
                os._exit(143)
            self.request("SIGTERM")

        try:
            self._prev = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread (unit-test harnesses)
            self._prev = None
        return self

    def __exit__(self, *exc):
        import signal
        try:
            signal.alarm(0)
        except Exception:  # noqa: BLE001
            pass
        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
        return False

    def request(self, reason: str):
        import signal
        if not self.stopped:
            self.stopped = True
            self._logger.warning(
                "%s: stopping after the current step (final save/partial "
                "results; hard exit in %ds if that hangs)", reason,
                self._alarm_s)
            try:
                signal.alarm(self._alarm_s)
            except Exception:  # noqa: BLE001
                pass

    def check(self) -> bool:
        """Poll once per unit of work; True means stop now."""
        import os
        if not self.stopped and any(os.path.exists(p) for p in self._files):
            self.request("stop file")
        return self.stopped


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
            (pred, losses), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, spec, train=True,
                method=model.forward_with_loss, mutable=["batch_stats"])
            losses = dict(losses)
            # surface capacity overflow in TRAINING summaries too (not
            # just validation): worst voxels-over-capacity across levels
            # — >0 means points were dropped this step
            nv = pred["n_voxels"]
            if nv.shape[0]:
                caps = jnp.asarray(spec.capacities[1:], jnp.int32)[:, None]
                losses["voxel_overflow"] = jnp.max(nv - caps).astype(
                    jnp.float32)
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


def make_test_step(model, spec: PyramidSpec):
    """Protocol-eval step returning ONLY what the test loop consumes
    (all-layer poses, losses, pose metrics, occupancy counters).

    Rationale: the serial round-2 loop materialized ~15 scalars per
    pair with individual blocking `float()` syncs — each a full
    round-trip over the remote TPU tunnel — which made protocol sweeps
    host-bound at <1 pair/s. A slim output pytree is fetched with ONE
    `jax.device_get` per (batched) call instead.

    cfg `test_ransac: true` additionally refits the FINAL layer's pose
    with the on-device batched RANSAC over the predicted
    correspondences, confidence-weighted Gumbel sampling (same wiring
    as InferenceEngine.register(refine='ransac'); reference analogue:
    the vendored ransaclib, models/ransaclib/ransac.py:303) — entirely
    in-graph, so protocol sweeps measure refined RR at no host cost.

    cfg `test_ransac_select: true` keeps BOTH candidate poses and picks
    the per-pair winner by confidence-weighted inlier count (measured:
    RANSAC wins low-overlap pairs, the learned pose wins high-inlier
    ones — selection captures both regimes)."""
    cfg = dict(model.cfg)
    use_select = bool(cfg.get("test_ransac_select", False))
    use_ransac = bool(cfg.get("test_ransac", False)) or use_select

    @jax.jit
    def test_step(state: TrainState, batch):
        pred, losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, spec, train=False, method=model.forward_with_loss)
        if use_ransac:
            from ..models.ransac import ransac_rigid_batch
            corr_src = jnp.concatenate(
                [pred["src_kp"], pred["tgt_kp_warped"][-1]], axis=1)
            corr_tgt = jnp.concatenate(
                [pred["src_kp_warped"][-1], pred["tgt_kp"]], axis=1)
            w = jnp.concatenate(
                [jax.nn.sigmoid(pred["src_overlap"][-1, ..., 0]),
                 jax.nn.sigmoid(pred["tgt_overlap"][-1, ..., 0])], axis=1)
            m = jnp.concatenate(
                [pred["src_mask_c"], pred["tgt_mask_c"]], axis=1)
            thr = float(cfg.get("test_ransac_threshold", 0.05))
            pose_r, _, _ = ransac_rigid_batch(
                corr_src, corr_tgt, jax.random.PRNGKey(0), weights=w,
                mask=m, sampler="gumbel", inlier_threshold=thr)
            if use_select:
                from ..models.ransac import weighted_inlier_score
                pose_l = pred["pose"][-1]                      # (B, 3, 4)
                s_r = weighted_inlier_score(
                    pose_r, corr_src, corr_tgt, w, m, thr)
                s_l = weighted_inlier_score(
                    pose_l, corr_src, corr_tgt, w, m, thr)
                pose_r = jnp.where((s_r > s_l)[:, None, None],
                                   pose_r, pose_l)
            pred = dict(pred)
            pred["pose"] = pred["pose"].at[-1].set(pose_r)
        metrics = compute_pose_metrics(pred, batch)
        slim = {"pose": pred["pose"],            # (L, B, 3, 4)
                "n_voxels": pred["n_voxels"]}    # (levels-1, 2B)
        return slim, losses, metrics

    return test_step


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
        self._warned_replicated: set = set()
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
            shardable = v.shape and v.shape[0] % n_data == 0
            if (not shardable and n_data > 1 and v.shape
                    and v.shape[0] > 1 and k not in self._warned_replicated):
                # a multi-row batch axis that doesn't divide the data
                # axis silently replicates = n_data x redundant compute
                self._warned_replicated.add(k)
                self.logger.warning(
                    "batch key '%s' (leading dim %d) is REPLICATED over "
                    "the %d-way data axis instead of sharded — make the "
                    "global batch size a multiple of the data-axis size",
                    k, v.shape[0], n_data)
            out[k] = jax.device_put(v, sh if shardable else rep)
        return out

    # ------------------------------------------------------------------
    def fit(self, model, spec: PyramidSpec, train_loader, val_loader,
            resume: Optional[str] = None):
        cfg = self.cfg
        first = next(iter(train_loader))
        n_data = self.mesh.shape["data"]
        if (n_data > 1 and first["src_xyz"].shape[0] % n_data != 0
                and not cfg.get("allow_replicated_train_batch", False)):
            # hard contract: global batch = per-device batch x data-axis
            # size. Anything else silently replicates (n_data x
            # redundant compute) — refuse to train that way.
            # allow_replicated_train_batch: true opts out explicitly
            # (tests / debugging only).
            raise ValueError(
                f"train batch size {first['src_xyz'].shape[0]} does not "
                f"divide the {n_data}-way data axis; set train_batch_size "
                f"to per_device_batch * {n_data} (global-batch contract)")
        state, tx = create_train_state(model, cfg, spec, self._put(first))
        if self.tp > 1:
            # Megatron-split the transformer weights over the 'model'
            # axis (parallel/tp.py); GSPMD handles the collectives.
            from ..parallel.tp import shard_tree
            state = shard_tree(state, self.mesh)
        if resume:
            if resume.endswith(".npz"):
                # npz snapshot (durability path — train/snapshot.py):
                # params-only archives warm-start with fresh optimizer
                # state; full archives (final graceful-stop mirrors)
                # restore Adam moments + schedule position too —
                # load_params_npz logs which happened
                from .snapshot import load_params_npz
                state, step0 = load_params_npz(resume, state)
                self.logger.info(
                    "warm-started from snapshot %s (step %d)", resume, step0)
            else:
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
        # graceful stop (see GracefulStop): exit cleanly on SIGTERM or
        # a stop file, with a final validation + save + mirrors
        stopper = GracefulStop(self.logger, self.log_dir).__enter__()
        self._stop_requested = False
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
        while step < total_iter and not self._stop_requested:
            train_loader.set_epoch(epoch)
            for batch in device_prefetch(iter(train_loader), self._put):
                if step >= total_iter:
                    break
                if stopper.check():
                    self._stop_requested = True
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
                    score = self._validate(eval_step, state, val_loader,
                                           step=step, spec=spec)
                    host_snapshot = jax.device_get(state)
                    snapshot_step = step
                    if self.saver.save(step, host_snapshot, score=score):
                        self._mirror_best(host_snapshot, score)
                    self._mirror_latest(host_snapshot, score)
            epoch += 1

        try:
            score = self._validate(eval_step, state, val_loader, step=step,
                                   spec=spec)
            final_host = jax.device_get(state)
            if self.saver.save(step, final_host, score=score):
                self._mirror_best(final_host, score)
            # unconditional final latest-mirror (rate limit bypassed):
            # the endgame eval queue restores from this npz if the best
            # mirror is stale. include_opt: the FINAL mirror carries the
            # optimizer state so a post-reset resume loses nothing
            # (hourly mirrors stay params-only for git size)
            self._last_latest_mirror = 0.0
            self._mirror_latest(final_host, score, include_opt=True)
            self.saver.wait()
        finally:
            stopper.__exit__()
        if skipped_acc is not None:
            n_skipped = float(skipped_acc)
        self.logger.info("done: %d steps%s, %d skipped, best score %.4f @ %s",
                         step,
                         " (stopped early)" if self._stop_requested else "",
                         int(n_skipped), self.saver.best_score,
                         self.saver.best_step)
        return state

    # ------------------------------------------------------------------
    def _mirror_best(self, host_state, score: float):
        """Mirror the new-best params into a small git-trackable npz
        (results/snapshots/) so a host reset cannot lose the trained
        model — orbax checkpoints live in gitignored logs/ and a
        round-3 VM reset erased all of them."""
        import os

        from .snapshot import save_params_npz
        name = self.cfg.get("expt_name")
        if not name:
            # mirroring is a durability feature for named experiment
            # runs; unnamed (unit-test) trainers must not write into
            # the repo's results/ tree
            return
        d = os.path.join("results", "snapshots")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}_best.npz")
        # atomic write: a durability watcher git-commits results/ every
        # few minutes and must never pick up a half-written archive
        from .snapshot import atomic_save_params_npz
        atomic_save_params_npz(path, host_state, meta={"score": float(score)})
        self.logger.info("mirrored best params -> %s (score %.4f)",
                         path, score)

    def _mirror_latest(self, host_state, score: float,
                       include_opt: bool = False):
        """Hourly unconditional mirror of the LATEST params. The best-only
        mirror goes stale whenever the val score plateaus (the third VM
        reset this round recovered a step-1000/score-0.0 npz from a run
        thousands of steps further along); this bounds the loss to ~1h
        of training regardless of the score trajectory."""
        import os
        import time as _time

        name = self.cfg.get("expt_name")
        if not name:
            return
        now = _time.time()
        last = getattr(self, "_last_latest_mirror", 0.0)
        if now - last < float(self.cfg.get("latest_mirror_secs", 3600)):
            return
        self._last_latest_mirror = now
        from .snapshot import atomic_save_params_npz
        d = os.path.join("results", "snapshots")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}_latest.npz")
        atomic_save_params_npz(path, host_state, meta={"score": float(score)},
                               include_opt=include_opt)
        self.logger.info("mirrored latest params -> %s%s", path,
                         " (with optimizer state)" if include_opt else "")

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

        Throughput design (round 3): pairs are loaded by a background
        thread pool (overlapping host IO with device compute, like the
        fit() prefetch), grouped per bucket into batches of
        cfg `eval_batch_size` (scaled down for larger buckets), and
        each batched device call is drained with a single device_get —
        the reference's test loop at least overlapped via DataLoader
        workers (trainer.py:185-217); round 2's serial loop did
        neither and ran <1 pair/s.
        """
        import os
        from ..data.buckets import collate_pairs
        from ..ops.pyramid import scale_spec

        cfg = self.cfg
        n0 = spec.capacities[0]
        buckets = sorted(int(b) for b in cfg.get("eval_buckets", [n0]))
        # voxel-capacity headroom at eval: dense test fragments occupy
        # more level>=1 voxels than the train-calibrated capacities
        # allow (see scale_spec docstring) — never drop test geometry
        headroom = float(cfg.get("eval_capacity_headroom", 1.0))

        first = collate_pairs([dataset.__getitem__(0)], buckets[0])
        spec0 = scale_spec(spec, buckets[0], headroom)
        state, tx = create_train_state(model, cfg, spec0, self._put(first),
                                       abstract=True)
        if resume.endswith(".npz"):
            from .snapshot import load_params_npz
            state, step0 = load_params_npz(resume, state)
        else:
            saver = CheckpointManager(resume)
            state, step0 = saver.load(state, best=True)
        self.logger.info("testing with checkpoint step %d", step0)

        import collections
        from concurrent.futures import ThreadPoolExecutor

        test_steps: Dict[int, Any] = {}

        def step_for(bucket: int):
            if bucket not in test_steps:
                self.logger.info("eval bucket %d: compiling", bucket)
                test_steps[bucket] = make_test_step(
                    model, scale_spec(spec, bucket, headroom))
            return test_steps[bucket]

        b0 = int(cfg.get("eval_batch_size", 4))

        def batch_size_for(bucket: int) -> int:
            # scale the pair batch down with bucket size so the
            # activation footprint stays roughly constant
            return max(1, (b0 * buckets[0]) // bucket)

        stats = StatsMeter()
        modelnet_metrics = []
        modelnet_poses: Dict[int, np.ndarray] = {}   # idx -> (3, 4)
        n_subsampled = 0
        n_done = 0
        worst_voxels: Dict[int, np.ndarray] = {}     # bucket -> (levels-1,)
        t0 = time.time()

        def process_one(idx, sample, batch, pose_all, rot, trans, losses_np):
            """Host-side bookkeeping for ONE real pair of a drained
            batch (pose_all (L,3,4); rot/trans (L,) per-layer errors)."""
            nonlocal n_done
            stats.update_dict(losses_np)
            stats.update("rot_err_deg_final", float(rot[-1]))
            stats.update("trans_err_final", float(trans[-1]))
            success = (rot[-1] < self.rot_th) & (trans[-1] < self.trans_th)
            stats.update("reg_success_final", float(success))

            pose_final = pose_all[-1]                             # (3, 4)
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
                modelnet_metrics.append((idx, m))
                modelnet_poses[idx] = pose_final

            n_done += 1
            if n_done % 100 == 0:
                rate = n_done / (time.time() - t0)
                self.logger.info("test %d/%d (%.2f pairs/s)",
                                 n_done, len(dataset), rate)

        inflight = collections.deque()
        # wall-clock of the first drained batch: separates one-time
        # startup (restore + per-bucket jit/cache-load, minutes via the
        # remote compile relay) from the steady-state sweep rate
        t_first = [None]
        n_at_first = [0]

        def drain_one():
            bucket, items, host_batch, dev = inflight.popleft()
            # ONE transfer for the whole batched result
            slim, losses, metrics = jax.device_get(dev)
            if t_first[0] is None:
                t_first[0] = time.time()
                n_at_first[0] = n_done
            nv = np.max(slim["n_voxels"], axis=-1) if slim["n_voxels"].size \
                else np.zeros((0,), np.int32)
            worst_voxels[bucket] = np.maximum(
                worst_voxels.get(bucket, np.zeros_like(nv)), nv)
            rot = np.asarray(metrics["rot_deg"])      # (L, B)
            trans = np.asarray(metrics["trans"])
            losses_np = {k: float(v) for k, v in losses.items()}
            for slot, (idx, sample) in enumerate(items):
                sub = {k: v[slot:slot + 1] for k, v in host_batch.items()
                       if isinstance(v, np.ndarray) and v.ndim > 0
                       and v.shape[0] == rot.shape[1]}
                process_one(idx, sample, sub, slim["pose"][:, slot],
                            rot[:, slot], trans[:, slot], losses_np)

        def flush(bucket, items):
            """Pad the partial batch by repeating the last sample (its
            duplicate slots are simply not read back), run the batched
            step, and queue the async result."""
            nonlocal n_subsampled
            bsz = batch_size_for(bucket)
            samples = [s for _, s in items]
            padded = samples + [samples[-1]] * (bsz - len(samples))
            host_batch = collate_pairs(padded, bucket)
            dev = step_for(bucket)(state, self._put(host_batch))
            inflight.append((bucket, items, host_batch, dev))
            if len(inflight) > 2:
                drain_one()

        pending: Dict[int, list] = {}

        def enqueue(idx, sample):
            nonlocal n_subsampled
            n_need = max(len(sample["src_xyz"]), len(sample["tgt_xyz"]))
            bucket = next((bb for bb in buckets if bb >= n_need), buckets[-1])
            if n_need > bucket:
                n_subsampled += 1
            pending.setdefault(bucket, []).append((idx, sample))
            if len(pending[bucket]) >= batch_size_for(bucket):
                flush(bucket, pending.pop(bucket))

        # graceful stop (see GracefulStop): a budget-capped eval under
        # `timeout` salvages partial results instead of dying mid-batch
        stopper = GracefulStop(self.logger, self.log_dir).__enter__()
        try:
            # background host loading: bounded lookahead so IO overlaps
            # the device calls without holding the whole sweep in RAM
            with ThreadPoolExecutor(max_workers=2) as ex:
                lookahead = collections.deque()
                for idx in range(len(dataset)):
                    if stopper.check():
                        break
                    lookahead.append(
                        (idx, ex.submit(dataset.__getitem__, idx)))
                    if len(lookahead) >= min(16, len(dataset)):
                        i, fut = lookahead.popleft()
                        enqueue(i, fut.result())
                while lookahead and not stopper.check():
                    i, fut = lookahead.popleft()
                    enqueue(i, fut.result())
                if stopper.stopped:
                    lookahead.clear()
            if not stopper.stopped:
                for bucket, items in sorted(pending.items()):
                    if items:
                        flush(bucket, items)
            while inflight:
                drain_one()
            if stopper.stopped:
                self.logger.warning(
                    "PARTIAL EVAL: stopped after %d/%d pairs — metrics "
                    "and recall below cover only the evaluated subset "
                    "(unevaluated pairs in reached scenes count as "
                    "failures)", n_done, len(dataset))
        finally:
            stopper.__exit__()

        for bucket, nv in sorted(worst_voxels.items()):
            caps = scale_spec(spec, bucket).capacities[1:]
            for lvl, worst in enumerate(nv):
                if int(worst) > caps[lvl]:
                    self.logger.warning(
                        "test bucket %d: pyramid level %d overflow — worst "
                        "%d voxels > capacity %d (points dropped; "
                        "recalibrate capacities)",
                        bucket, lvl + 1, int(worst), caps[lvl])

        avgs = stats.avgs()
        self.logger.info(metrics_to_string(avgs, "[test] "))
        if n_subsampled:
            self.logger.warning(
                "%d/%d pairs exceeded the largest eval bucket (%d) and "
                "were subsampled — add a larger bucket to eval_buckets "
                "for full protocol fidelity", n_subsampled, len(dataset),
                buckets[-1])
        t_end = time.time()
        sweep_pps = (n_done - n_at_first[0]) / max(t_end - t_first[0], 1e-9) \
            if t_first[0] is not None and n_done > n_at_first[0] else 0.0
        self.logger.info(
            "test sweep: %d pairs, %.1fs total (%.1fs startup: restore + "
            "bucket compiles/cache loads), steady-state %.2f pairs/s",
            n_done, t_end - t0,
            (t_first[0] or t_end) - t0, sweep_pps)
        results: Dict = {"metrics": avgs,
                         "pairs_per_sec": len(dataset) / (t_end - t0),
                         "sweep_pairs_per_sec": sweep_pps,
                         "n_subsampled": n_subsampled,
                         "partial": stopper.stopped,
                         "n_done": n_done}

        if cfg["dataset"] in ("3dmatch", "MCD_KTH") and n_done > 0:
            from ..benchmark.benchmark_3dmatch_rr import benchmark
            if gt_root is None:
                # gt.log/gt.info live next to the dataset infos — for
                # the synthetic stand-in that is info_dir/benchmarks,
                # same layout as the real Predator root.
                gt_root = os.path.join(
                    cfg.get("info_dir", "datasets/3dmatch"), "benchmarks")
            report, mean_recall, details = benchmark(
                os.path.join(self.log_dir, benchmark_name),
                os.path.join(gt_root, benchmark_name), with_details=True,
                missing_ok=stopper.stopped)
            self.logger.info("\n%s", report)
            results["registration_recall"] = mean_recall
            results["report"] = report
            bins = self._rr_by_overlap_bin(dataset, details)
            if bins:
                results["rr_by_overlap"] = bins
                self.logger.info(
                    "RR by GT-overlap bin: %s",
                    " | ".join(f"[{lo:.2f},{hi:.2f}): {rr:.3f} (n={n})"
                               for lo, hi, rr, n in bins))
        elif cfg["dataset"] == "modelnet" and modelnet_metrics:
            from ..benchmark import benchmark_modelnet as bm
            modelnet_metrics.sort(key=lambda im: im[0])   # dataset order
            cat = {k: np.concatenate([m[k] for _, m in modelnet_metrics])
                   for k in modelnet_metrics[0][1]}
            summary = bm.summarize_metrics(cat)
            bm.print_metrics(self.logger, summary)
            np.save(os.path.join(self.log_dir, "pred_transforms.npy"),
                    np.stack([modelnet_poses[i]
                              for i in sorted(modelnet_poses)]))
            results["summary"] = summary
        return results

    @staticmethod
    def _rr_by_overlap_bin(dataset, details, edges=(0.1, 0.2, 0.3, 0.4,
                                                    0.6, 1.01)):
        """Join per-pair RR outcomes with the dataset's GT overlap
        ratios and bin them — the low-overlap diagnosis the 3DLoMatch
        split calls for (its whole premise is overlap in [0.1, 0.3),
        reference test.py:63-66)."""
        infos = getattr(dataset, "infos", None)
        if not infos or "overlap" not in infos:
            return []
        import os as _os
        ov_by_key = {}
        for k in range(len(infos["overlap"])):
            scene = infos["src"][k].split(_os.path.sep)[1]
            s_idx = int(_os.path.basename(infos["src"][k])
                        .split("_")[-1].split(".")[0])
            t_idx = int(_os.path.basename(infos["tgt"][k])
                        .split("_")[-1].split(".")[0])
            ov_by_key[(scene, t_idx, s_idx)] = float(infos["overlap"][k])
        binned = [[] for _ in range(len(edges) - 1)]
        for d in details:
            ov = ov_by_key.get((d["scene"], d["tgt_idx"], d["src_idx"]))
            if ov is None:
                continue
            for bi in range(len(edges) - 1):
                if edges[bi] <= ov < edges[bi + 1]:
                    binned[bi].append(d["success"])
                    break
        return [(edges[bi], edges[bi + 1], float(np.mean(b)), len(b))
                for bi, b in enumerate(binned) if b]

    # ------------------------------------------------------------------
    def _validate(self, eval_step, state, val_loader, step: int = 0,
                  limit: Optional[int] = None, spec: Optional[PyramidSpec] = None)\
            -> float:
        stats = StatsMeter()
        worst_nv = None
        for i, batch in enumerate(val_loader):
            if limit is not None and i >= limit:
                break
            pred, losses, metrics = eval_step(state, self._put(batch))
            if spec is not None and "n_voxels" in pred:
                nv = np.max(np.asarray(pred["n_voxels"]), axis=-1) \
                    if np.asarray(pred["n_voxels"]).size else None
                if nv is not None:
                    worst_nv = nv if worst_nv is None else \
                        np.maximum(worst_nv, nv)
            stats.update_dict({k: float(v) for k, v in losses.items()})
            rot = np.asarray(metrics["rot_deg"])    # (L, B)
            trans = np.asarray(metrics["trans"])
            n_layers = rot.shape[0]
            for l in range(n_layers):
                stats.update(f"rot_err_{l}", float(rot[l].mean()), rot.shape[1])
                stats.update(f"trans_err_{l}", float(trans[l].mean()), rot.shape[1])
            success = (rot[-1] < self.rot_th) & (trans[-1] < self.trans_th)
            stats.update("reg_success_final", float(success.mean()), rot.shape[1])
        if worst_nv is not None and spec is not None:
            for lvl, worst in enumerate(worst_nv):
                cap = spec.capacities[lvl + 1]
                if int(worst) > cap:
                    self.logger.warning(
                        "pyramid level %d overflow across val: worst %d "
                        "voxels > capacity %d (points dropped; recalibrate "
                        "capacities)", lvl + 1, int(worst), cap)
        avgs = stats.avgs()
        self.logger.info(metrics_to_string(avgs, f"[val @ {step}] "))
        self.val_writer.add_scalars(avgs, step, prefix="val/")
        self.val_writer.flush()
        return avgs.get("reg_success_final", 0.0)
