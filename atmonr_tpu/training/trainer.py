"""Training runtime: one jitted step covering gather->forward->loss->backward
->update->progress-scatter, plus the host-side epoch loop for metrics,
logging, checkpointing, and profiling.

TPU-native counterpart of reference ``trainer.py:16-274``. Key redesigns:

- the whole step (including the batch gather out of the HBM-resident ray set
  and the progress-pixel scatter) is ONE donated jitted function — there is
  no per-iteration host<->device traffic; the reference's per-iter
  ``.cpu().numpy()`` progress writes (trainer.py:123-140) become a device
  scatter fetched once per epoch;
- the LR schedule lives inside the optimizer (optax step count), replacing
  the two torch scheduler objects;
- profiling uses ``jax.profiler`` traces (XProf/TensorBoard), replacing the
  torch profiler (reference trainer.py:221-237);
- checkpoints are Orbax pytrees per epoch with restore-latest resume.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from atmonr_tpu.data import batching
from atmonr_tpu.training import checkpoint as ckpt
from atmonr_tpu.training.metrics import image_metrics
from atmonr_tpu.training.schedules import make_lr_schedule


class _ScalarLogger:
    """TensorBoard writer when available, JSONL always.

    Multi-host: only process 0 writes (every process computes identical
    replicated metrics; N writers appending one shared-filesystem JSONL /
    event file would interleave corruptly)."""

    def __init__(self, log_dir: Path) -> None:
        self.jsonl = None
        self.tb = None
        if jax.process_index() != 0:
            return
        log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(log_dir / "metrics.jsonl", "a")
        try:
            from torch.utils.tensorboard.writer import SummaryWriter

            self.tb = SummaryWriter(str(log_dir))
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.jsonl is not None:
            self.jsonl.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": int(step)}
                )
                + "\n"
            )
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self.tb is not None:
            self.tb.add_image(tag, np.transpose(img_hwc, (2, 0, 1)), step)

    def flush(self) -> None:
        if self.jsonl is not None:
            self.jsonl.flush()
        if self.tb is not None:
            self.tb.flush()


class Trainer:
    """Trains a neural rendering pipeline on a HARP2 ray dataset."""

    def __init__(
        self,
        config: dict,
        dataset,
        pipeline,
        exp_name: str,
        data_root: str | Path = "data",
        seed: int = 0,
    ) -> None:
        self.config = config
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = int(config["batch_size"])
        if self.batch_size > len(dataset):
            import warnings

            warnings.warn(
                f"batch_size {self.batch_size} exceeds the ray count "
                f"{len(dataset)}; clamping to the dataset size."
            )
            self.batch_size = len(dataset)
        self.num_iters = int(config["num_iters"])
        self.print_frequency = int(config.get("print_frequency", 10))
        self.check_numerics = bool(config.get("check_numerics", False))
        # progress imagery/metrics: the per-band prediction gathers + the
        # pred-pixel scatters ride the donated step and cost ~5% of
        # steady-state throughput (tools/bench_trainer.py); config
        # "progress": false drops them (and the epoch PSNR/SSIM imagery)
        # for throughput-critical runs — loss logging and checkpoints are
        # unaffected
        self.progress = bool(config.get("progress", True))
        # restart-on-plateau collapse guard: the r5 sweep found a seed-borne
        # bimodal failure (~1 in 5 inits, present in the reference's
        # architecture) where one rendering branch dies in the first steps
        # and the loss pins at the constant-image floor (~1.6) — and every
        # tested in-trajectory guard (clip, eps, warmup, softplus density,
        # quiet surface head) only reshuffles WHICH seeds fail
        # (docs/performance.md "the seed-4 collapse"). A collapsed run is
        # detectable within ~150 iterations, so the production answer is
        # detect + reinit: config {"restart_on_plateau": {"check_iter": 150,
        # "loss_threshold": 1.0, "max_restarts": 3}} re-draws the init from
        # a folded key when the recent loss is still above the threshold at
        # the check point. Costs one loss fetch per check; off by default.
        rop = config.get("restart_on_plateau") or None
        if rop:
            rop = {
                "check_iter": int(rop.get("check_iter", 150)),
                "loss_threshold": float(rop.get("loss_threshold", 1.0)),
                "max_restarts": int(rop.get("max_restarts", 3)),
            }
        self.restart_on_plateau = rop
        self._restarts = 0
        self._restart_base = 0
        # gradient micro-batching: scan micro-batches of this many rays
        # inside the step, summing gradients before the one optimizer
        # update — mathematically the full-batch step (losses are per-ray
        # means), but peak activation memory and compile time scale with
        # the micro-batch. Required at the reference capacity (2^21 tables
        # x 1024 samples: 8.4 M points/step lane-pad past 16 GB HBM).
        self.micro_batch = self._normalize_micro(
            int(config.get("micro_batch_size", 0)) or None, self.batch_size
        )

        self.rays = dataset.rays()
        self.num_rays = len(dataset)
        self.steps_per_epoch = max(1, self.num_rays // self.batch_size)
        self.num_epochs = -(-self.num_iters // self.steps_per_epoch)

        lr_schedule = make_lr_schedule(
            config["scheduler"],
            config["optimizer"],
            self.num_iters,
            self.steps_per_epoch,
        )
        self.optimizer = pipeline.make_optimizer(config["optimizer"], lr_schedule)

        key = jax.random.PRNGKey(seed)
        self.base_key, init_key, self.perm_key, self.aux_key = (
            jax.random.split(key, 4)
        )
        params = pipeline.init_params(init_key)
        n = len(dataset)
        self.state = {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "aux": pipeline.init_aux(),
            "pred_pixels": jnp.zeros((n,), jnp.float32),
            "pred_pixels_surf": jnp.zeros((n,), jnp.float32),
            "pred_pixels_atmo": jnp.zeros((n,), jnp.float32),
        }
        self.aux_update_every = 0
        if getattr(pipeline, "occ_cfg", None) is not None:
            self.aux_update_every = pipeline.occ_cfg.update_every
            self._aux_update = jax.jit(pipeline.update_aux)
        self.epoch_idx = 0
        self.iter_count = 0
        # set here (not in iterate()) so a SIGTERM that lands after the
        # fan-out handler is installed but before this trainer's first step
        # is preserved rather than silently cleared
        self._preempted = False

        now = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.tensorboard_dir = (
            Path(data_root) / "tensorboard" / f"{exp_name}_{now}"
        )
        self.logger = _ScalarLogger(self.tensorboard_dir)

        self.mesh = None
        # per-epoch saves overlap with the next epoch's compute; train()
        # blocks on the last one before returning (training/checkpoint.py)
        self._ckpt_mgr = ckpt.AsyncCheckpointManager()
        self._train_step = self._make_train_step()
        # multi-host: one console narrator (logging is gated the same way)
        self._print = print if jax.process_index() == 0 else (lambda *a, **k: None)

    @staticmethod
    def _normalize_micro(
        micro: int | None, batch_size: int, n_data: int = 1
    ) -> int | None:
        """Fit a configured micro-batch size to the (possibly clamped)
        batch size: the scanned body needs ``batch_size % micro == 0`` and,
        under a mesh, shard_map needs equal per-chip micro shards
        (``micro % n_data == 0``). A config tuned for the full-size granule
        must not crash on a small one — shrink to the largest valid divisor
        (or disable) with a warning instead."""
        if not micro:
            return None
        if micro >= batch_size:
            if micro > batch_size:
                import warnings

                warnings.warn(
                    f"micro_batch_size {micro} >= batch_size {batch_size}; "
                    "micro-batching disabled."
                )
            return None
        if batch_size % micro == 0 and micro % n_data == 0:
            return micro
        fitted = next(
            (
                d
                for d in range(micro, 0, -1)
                if batch_size % d == 0 and d % n_data == 0
            ),
            None,
        )
        import warnings

        if fitted is None or fitted == batch_size:
            warnings.warn(
                f"micro_batch_size {micro} has no valid divisor of "
                f"batch_size {batch_size} on {n_data} data shards; "
                "micro-batching disabled."
            )
            return None
        warnings.warn(
            f"micro_batch_size {micro} does not divide batch_size "
            f"{batch_size} into whole {n_data}-shard micro-batches; "
            f"shrinking to {fitted}."
        )
        return fitted

    def place(self, device) -> None:
        """Pin this trainer's rays + state to one device without a mesh.

        Multi-granule ``--check-numerics`` path: the checkify step can't run
        under shard_map, but a one-device granule group only needs its
        arrays PLACED on that device, not sharded — this keeps the groups
        non-overlapping while the plain jitted checkify step stays legal."""
        import jax

        self.rays = jax.device_put(self.rays, device)
        self.state = jax.device_put(self.state, device)

    def shard(self, mesh) -> None:
        """Switch to multi-chip training: shard the HBM-resident ray store
        over the mesh "data" axis and replicate parameters/optimizer state.

        The jitted step then routes the forward through ``shard_map`` — the
        Pallas hash kernels are opaque custom calls with no GSPMD
        partitioning rule, so they must see shard-local shapes to scale
        (``parallel.train.forward_loss_data_sharded``); with a "sample" axis
        > 1 the Instant-NGP sample-sharded march + exact blockwise
        compositor is used instead (``ngp_forward_sample_sharded``). The
        parameter-gradient all-reduce rides ICI either way."""
        from atmonr_tpu.parallel.sharding import replicate, shard_rays

        ns = dict(mesh.shape).get("sample", 1)
        if ns > 1:
            if "num_samples_per_ray" not in self.pipeline.config:
                raise ValueError(
                    "a 'sample' mesh axis > 1 requires the Instant-NGP "
                    "pipeline (hierarchical NeRF resamples adaptively; "
                    "shard its rays over 'data' instead)"
                )
            if getattr(self.pipeline, "occ_cfg", None) is not None:
                n_samples = self.pipeline.occ_cfg.n_fine
            else:
                n_samples = int(self.pipeline.config["num_samples_per_ray"])
            if n_samples % ns != 0:
                raise ValueError(
                    f"samples per ray ({n_samples}) must divide the mesh "
                    f"'sample' axis ({ns})"
                )
        self.mesh = mesh
        # re-jit: the step body branches on the installed mesh
        self._train_step = self._make_train_step()
        if jax.process_count() > 1:
            # multi-host: every process contributes only the rows its
            # addressable devices own (parallel.data); HBM scales 1/hosts
            from atmonr_tpu.parallel.data import (
                host_ray_slice,
                shard_rays_from_hosts,
            )

            host = self.dataset.host_rays()
            n_total = host["origin"].shape[0]
            sl = host_ray_slice(n_total, mesh)
            self.rays = shard_rays_from_hosts(
                {k: v[sl] for k, v in host.items()}, n_total, mesh
            )
        else:
            self.rays = shard_rays(self.rays, mesh)
        self.num_rays = int(self.rays["origin"].shape[0])
        # trimming to a mesh multiple can drop below a dataset-clamped batch;
        # shard_map needs equal per-chip batch shards
        n_data = dict(mesh.shape).get("data", 1)
        self.batch_size = min(self.batch_size, self.num_rays)
        self.batch_size -= self.batch_size % n_data
        assert self.batch_size > 0, (self.num_rays, n_data)
        # micro-batching composes with the mesh (the scanned body wraps the
        # shard_map forward), but each micro-batch must itself split into
        # equal per-chip shards — refit to the trimmed batch under that
        # extra constraint
        self.micro_batch = self._normalize_micro(
            self.micro_batch, self.batch_size, n_data
        )
        self.steps_per_epoch = max(1, self.num_rays // self.batch_size)
        self.num_epochs = -(-self.num_iters // self.steps_per_epoch)
        self.state = replicate(self.state, mesh)

    # -- the jitted step -----------------------------------------------------

    def _make_train_step(self):
        """The donated jitted step; ``check_numerics`` runs it under
        ``checkify`` float checks instead. XLA never traps on NaN/inf — a NaN
        born in one step silently poisons every later step and surfaces as a
        flat loss hours later. This debug mode (config
        ``trainer.check_numerics`` / ``train.py --check-numerics``) makes the
        first NaN/inf/0-div raise with the producing op's source line, at the
        cost of a host sync per iteration. The framework's sanitizer story
        (SURVEY §5): the reference relies on pyright/Ruff only."""
        if not self.check_numerics:
            return jax.jit(self._step, donate_argnums=(0,))
        if self.mesh is not None:
            # checkify's error pytree does not transpose through the
            # shard_map bodies (jit(checkify(step)) fails at trace time on a
            # sharded mesh); surface that now instead of deep in a pod run
            raise NotImplementedError(
                "check_numerics is single-device only for now: checkify "
                "cannot wrap the shard_map training step. Train unsharded "
                "(no --mesh; one device per granule) to localize the NaN, "
                "or drop --check-numerics to train sharded."
            )
        from jax.experimental import checkify

        checked = jax.jit(
            checkify.checkify(self._step, errors=checkify.float_checks),
            donate_argnums=(0,),
        )

        def step_and_throw(*args):
            err, out = checked(*args)
            err.throw()
            return out

        return step_and_throw

    def _step(self, state, rays, perm, step_in_epoch, global_step):
        batch = batching.batch_at_step(
            rays, perm, step_in_epoch, self.batch_size
        )
        key = jax.random.fold_in(self.base_key, global_step)
        mesh = self.mesh
        multi = mesh is not None and mesh.devices.size > 1
        sample_sharded = multi and dict(mesh.shape).get("sample", 1) > 1

        def batch_loss(params, bat, k):
            if sample_sharded:
                from atmonr_tpu.parallel.train import (
                    ngp_forward_sample_sharded,
                )

                results = ngp_forward_sample_sharded(
                    self.pipeline, params, bat, mesh, k,
                    aux=state["aux"] or None,
                )
                return self.pipeline.compute_loss(bat, results), results
            if multi:
                from atmonr_tpu.parallel.train import (
                    forward_loss_data_sharded,
                )

                return forward_loss_data_sharded(
                    self.pipeline, params, bat, mesh, k,
                    aux=state["aux"] or None,
                )
            results = self.pipeline.forward(
                params, bat, k, aux=state["aux"] or None
            )
            return self.pipeline.compute_loss(bat, results), results

        pred_keys = ("color_map_fine", "color_map_surf", "color_map_atmo")

        def band_preds(results, mbatch):
            irgb = mbatch["irgb_idx"][:, None]
            out = []
            for name in pred_keys:
                if name not in results:  # NeRF has no surface/atmo split
                    out.append(jnp.zeros((irgb.shape[0],), jnp.float32))
                else:
                    out.append(
                        jnp.take_along_axis(results[name], irgb, axis=1)[
                            :, 0
                        ].astype(jnp.float32)
                    )
            return tuple(out)

        if self.micro_batch and self.micro_batch < self.batch_size:
            # gradient micro-batching: the scanned body compiles once at
            # the micro-batch size; gradients of per-ray-mean losses
            # average exactly to the full-batch gradient. Under a mesh the
            # body routes through the same shard_map forward as the
            # full-batch path (scan-of-shard_map), so the reference-capacity
            # config that NEEDS micro-batching for memory keeps it when
            # trained with --mesh (r3 VERDICT: it was silently ignored).
            n_micro = self.batch_size // self.micro_batch
            micro = jax.tree_util.tree_map(
                lambda v: v.reshape(n_micro, self.micro_batch, *v.shape[1:]),
                batch,
            )

            def body(_, inp):
                i, mbatch = inp
                mkey = jax.random.fold_in(key, i)

                (l, results), g = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(state["params"], mbatch, mkey)
                extras = band_preds(results, mbatch) if self.progress else ()
                return None, (l, g, extras)

            _, (losses, grads_stacked, preds_stacked) = jax.lax.scan(
                body, None, (jnp.arange(n_micro), micro)
            )
            loss = jnp.mean(losses)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.mean(g, axis=0), grads_stacked
            )
            preds = tuple(p.reshape(-1) for p in preds_stacked)
        else:
            (loss, results), grads = jax.value_and_grad(
                batch_loss, has_aux=True
            )(state["params"], batch, key)
            preds = band_preds(results, batch) if self.progress else ()
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)

        new_state = {
            "params": params,
            "opt_state": opt_state,
            "aux": state["aux"],
        }
        if self.progress:
            idx = batch["idx"]
            new_state["pred_pixels"] = state["pred_pixels"].at[idx].set(preds[0])
            new_state["pred_pixels_surf"] = (
                state["pred_pixels_surf"].at[idx].set(preds[1])
            )
            new_state["pred_pixels_atmo"] = (
                state["pred_pixels_atmo"].at[idx].set(preds[2])
            )
        else:
            # pass the (donated, untouched) buffers through so the state
            # pytree keeps one structure either way
            for k in ("pred_pixels", "pred_pixels_surf", "pred_pixels_atmo"):
                new_state[k] = state[k]
        return new_state, loss

    # -- the epoch loop ------------------------------------------------------

    def _log_loss_block(self, step: int, mean_arr: Any) -> None:
        """Emit one print block's mean loss (scalar log + console line).
        ``mean_arr`` is the device-side block mean ENQUEUED at the block
        boundary and fetched here one block later — by then it is computed,
        so the fetch is a single ready-buffer transfer."""
        mean_loss = float(mean_arr)
        self.logger.scalar("Loss", mean_loss, step)
        line = f"{step}/{self.num_iters} | Loss: {mean_loss:.5f}"
        self._print(
            line + max(0, self._last_len - len(line)) * " ", end="\r"
        )
        self._last_len = len(line)

    def _reinit_for_restart(self, recent_loss: float) -> None:
        """Re-draw the init from a folded key after a detected collapse
        (see ``restart_on_plateau``). The iteration budget keeps counting —
        a restart costs the iterations already spent, which is the honest
        accounting for matched-wall-clock comparisons."""
        self._restarts += 1
        self._print(
            f"\n[restart {self._restarts}] loss {recent_loss:.3f} still "
            f"above {self.restart_on_plateau['loss_threshold']:g} at iter "
            f"{self.iter_count}; re-drawing the init"
        )
        init_key = jax.random.fold_in(self.base_key, 7919 * self._restarts)
        params = self.pipeline.init_params(init_key)
        self.state["params"] = params
        self.state["opt_state"] = self.optimizer.init(params)
        self.state["aux"] = self.pipeline.init_aux()
        if self.mesh is not None:
            from atmonr_tpu.parallel.sharding import replicate

            self.state = replicate(self.state, self.mesh)

    def install_preemption_handler(self) -> None:
        """Preemption-safe training: on SIGTERM (the TPU-pod maintenance /
        spot-reclaim signal), finish the in-flight step, write a checkpoint,
        and return cleanly from ``train`` so ``--resume`` restarts exactly
        where it stopped. The reference has no failure handling at all
        (SURVEY §5); this is the minimum a preemptible fleet needs."""
        import signal

        def _on_sigterm(signum, frame):
            self._preempted = True

        signal.signal(signal.SIGTERM, _on_sigterm)

    def train(self, output_path: str | Path, profile: bool = False) -> None:
        for _ in self.iterate(output_path, profile):
            pass

    def iterate(self, output_path: str | Path, profile: bool = False):
        """The training loop as a generator that yields after every
        dispatched step. ``train()`` just drains it; the multi-granule
        driver (``training.multi.train_granules``) round-robins several
        trainers' generators so their steps — compiled for disjoint device
        groups — overlap via JAX's async dispatch."""
        output_path = Path(output_path)
        output_path.mkdir(parents=True, exist_ok=True)
        running: list[Any] = []
        # loss logging lags ONE print block: fetching the current block's
        # mean would enqueue a reduction behind the in-flight steps and
        # stall the async dispatch queue (measured 12% of steady-state
        # throughput, tools/bench_trainer.py); a block that is
        # print_frequency steps old is already computed, so its device
        # scalars fetch without draining the queue
        prev_block: tuple[int, list[Any]] | None = None
        self._last_len = 0
        profiling = False
        if profile:
            jax.profiler.start_trace(str(self.tensorboard_dir))
            profiling = True

        while self.iter_count < self.num_iters:
            self.perm_key, sub = jax.random.split(self.perm_key)
            perm = batching.epoch_permutation(
                sub, self.num_rays, self.batch_size
            )
            for i in range(self.steps_per_epoch):
                self.state, loss = self._train_step(
                    self.state, self.rays, perm, i, self.iter_count
                )
                self.iter_count += 1
                if (
                    self.aux_update_every
                    and self.iter_count % self.aux_update_every == 0
                ):
                    self.state["aux"] = self._aux_update(
                        self.state["params"],
                        self.state["aux"],
                        jax.random.fold_in(self.aux_key, self.iter_count),
                    )
                # keep exactly the last print_frequency losses so each
                # block mean averages its own block only (ADVICE r4: the
                # old trim-then-append kept pf+1 values after block one,
                # leaking the previous block's last loss into every mean)
                running = (running + [loss])[-self.print_frequency :]
                if (
                    self.restart_on_plateau is not None
                    and self._restarts < self.restart_on_plateau["max_restarts"]
                    and self.iter_count - self._restart_base
                    == self.restart_on_plateau["check_iter"]
                ):
                    recent = float(jnp.mean(jnp.stack(running[-5:])))
                    if recent > self.restart_on_plateau["loss_threshold"]:
                        self._reinit_for_restart(recent)
                        self._restart_base = self.iter_count
                    else:
                        # a healthy run stays healthy (the collapse is an
                        # init phenomenon); stop checking
                        self._restarts = self.restart_on_plateau[
                            "max_restarts"
                        ]
                yield self.iter_count
                if self.iter_count % self.print_frequency == 0:
                    if prev_block is not None:
                        self._log_loss_block(*prev_block)
                    # dispatch-only: the tiny mean kernel queues behind the
                    # in-flight steps and is ready when fetched next block
                    prev_block = (
                        self.iter_count, jnp.mean(jnp.stack(running))
                    )
                if self.iter_count >= self.num_iters or self._preempted:
                    break

            if prev_block is not None:  # epoch end syncs anyway; flush
                self._log_loss_block(*prev_block)
                prev_block = None
            self.epoch_idx += 1
            self._end_of_epoch(self._last_len)
            self._last_len = 0
            self.save(output_path, self.epoch_idx)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
            if self._preempted:
                self._print(
                    f"\npreempted: checkpoint epoch {self.epoch_idx} saved, "
                    "resume with --resume"
                )
                break
        if profiling:
            jax.profiler.stop_trace()
        self._ckpt_mgr.wait()  # the last epoch's async save must be durable
        self._print()

    def _end_of_epoch(self, last_len: int = 0) -> None:
        if not self.progress:
            # the step never wrote pred_pixels; metrics/imagery would score
            # the zero image
            line = f"Epoch {self.epoch_idx}/{self.num_epochs}"
            self._print(line + max(0, last_len - len(line)) * " ")
            self.logger.flush()
            return
        ds = self.dataset
        pred_pixels = np.asarray(self.state["pred_pixels"])
        pred_img = ds.scatter_image(pred_pixels)
        target_img = ds.target_image()
        metrics = image_metrics(pred_img, target_img, ds.max_i)
        line = f"Epoch {self.epoch_idx}/{self.num_epochs}"
        for name, val in metrics.items():
            if isinstance(val, list):
                continue
            line += f" | {name}: {val:.3f}"
            self.logger.scalar(name, val, self.epoch_idx)
        self._print(line + max(0, last_len - len(line)) * " ")

        # side-by-side RGB comparison: surface | atmosphere | full | target
        pred_surf = ds.scatter_image(np.asarray(self.state["pred_pixels_surf"]))
        pred_atmo = ds.scatter_image(np.asarray(self.state["pred_pixels_atmo"]))
        viz = np.concatenate(
            [
                ds.get_rgb(pred_surf.transpose(2, 0, 1)),
                ds.get_rgb(pred_atmo.transpose(2, 0, 1)),
                ds.get_rgb(pred_img.transpose(2, 0, 1)),
                ds.get_rgb(target_img.transpose(2, 0, 1)),
            ],
            axis=1,
        )
        self.logger.image(f"Epoch {self.epoch_idx}", viz, self.epoch_idx)
        self.logger.flush()

    # -- checkpointing -------------------------------------------------------

    def save(self, output_path: str | Path, epoch: int) -> None:
        saved = {
            "params": self.state["params"],
            "opt_state": self.state["opt_state"],
        }
        if self.state["aux"]:
            saved["aux"] = self.state["aux"]
        self._ckpt_mgr.save(
            output_path,
            epoch,
            saved,
            extra={
                "epoch_idx": self.epoch_idx,
                "iter_count": self.iter_count,
                "tensorboard_dir": str(self.tensorboard_dir),
            },
        )

    def load(self, output_path: str | Path) -> None:
        self._ckpt_mgr.wait()  # an in-flight save may be the latest epoch
        template = {
            "params": self.state["params"],
            "opt_state": self.state["opt_state"],
        }
        if self.state["aux"]:
            template["aux"] = self.state["aux"]
        restored, epoch, extra = ckpt.restore_checkpoint(output_path, template)
        self.state["params"] = restored["params"]
        self.state["opt_state"] = restored["opt_state"]
        if "aux" in restored:
            self.state["aux"] = restored["aux"]
        self.epoch_idx = int(extra.get("epoch_idx", epoch))
        self.iter_count = int(extra.get("iter_count", epoch * self.steps_per_epoch))
        if "tensorboard_dir" in extra:
            self.tensorboard_dir = Path(extra["tensorboard_dir"])
            self.logger = _ScalarLogger(self.tensorboard_dir)
