"""Multi-view depth training engine — the jit-compiled TPU train loop.

Behavioral parity with the reference engine
(rmvd/train/multi_view_depth_training.py:23-487): iteration-based loop over
a shuffled loader, host-side batch augmentations, inputs/GT split, forward
+ loss + backward + optional grad-norm clip + optimizer/scheduler step;
print/log/log_loss intervals, time-based checkpointing (20 min default)
with ``snapshot-iter-{:09d}`` naming and max_to_keep=3, auto-resume from
the newest checkpoint at startup, and a final weights-only snapshot.

TPU-native design:
- the entire step (forward, loss incl. the manual L2 regularization,
  gradient, clip, optimizer update) is ONE jitted function over a
  TrainState pytree — the schedule and warmup switch live inside the
  compiled graph so the step never retraces across iterations;
- when a Mesh is supplied, the step is jitted with data-parallel sharding
  constraints (batch axis over the "data" mesh axis) and XLA inserts the
  gradient psums (the reference's DataParallel equivalent,
  rmvd/models/helpers.py:163-169);
- host work (loading, augmentation, collation) overlaps device compute via
  the prefetching loader.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..optim.factory import build_optax
from ..utils import logging, writer
from ..utils.checkpoint import TrainStateSaver, WeightsOnlySaver
from ..data.registry import create_batch_augmentation


class MultiViewDepthTraining:
    def __init__(
        self,
        out_dir: str,
        model,
        dataset,
        optimizer,
        scheduler,
        loss,
        batch_size: int,
        max_iterations: int,
        inputs: Sequence[str] = None,
        batch_augmentations: Optional[Sequence] = None,
        alignment: Optional[str] = None,
        grad_clip_max_norm: Optional[float] = None,
        num_workers: Optional[int] = 8,
        print_interval: int = 100,
        log_loss_interval: int = 100,
        log_interval: int = 5000,
        save_checkpoint_interval_min: int = 20,
        mesh=None,
        verbose: bool = True,
        **_,
    ):
        self.verbose = verbose
        self.out_dir = out_dir
        self._init_dirs()

        self.dataset = dataset
        self.model = model
        self.optimizer_spec = optimizer
        self.scheduler_spec = scheduler
        self.loss = loss
        self.batch_size = batch_size
        self.grad_clip_max_norm = grad_clip_max_norm
        self.max_iterations = max_iterations
        self.mesh = mesh

        self.inputs = (
            list(set(inputs + ["images"]))
            if inputs is not None
            else ["images", "intrinsics", "poses"]
        )

        batch_augmentations = batch_augmentations or []
        if not isinstance(batch_augmentations, list):
            batch_augmentations = [batch_augmentations]
        self.batch_augmentations = [
            create_batch_augmentation(a) if isinstance(a, str) else a
            for a in batch_augmentations
        ]

        assert alignment is None, "Alignment is not yet implemented (matches reference)."
        self.alignment = alignment

        self.print_interval = print_interval
        self.log_interval = log_interval
        self.log_loss_interval = log_loss_interval
        self.save_checkpoint_interval_min = save_checkpoint_interval_min

        # multi-host: the dataset is partitioned by process (strided index
        # split, so a global batch never contains the same sample twice)
        # and each process shuffles only its own shard; each local batch
        # becomes that process's shard of the global batch (see
        # _build_train_step). Single-process keeps the global-RNG shuffle.
        loader_seed = None
        loader_indices = None
        if jax.process_count() > 1:
            loader_seed = 7919 * (jax.process_index() + 1)
            loader_indices = list(
                range(jax.process_index(), len(self.dataset), jax.process_count())
            )
        self.dataloader = self.dataset.get_loader(
            batch_size=batch_size,
            shuffle=True,
            num_workers=num_workers,
            drop_last=True,
            seed=loader_seed,
            indices=loader_indices,
        )

        # optax transform (clip + optimizer + schedule in one chain)
        self.tx, self.schedule = build_optax(
            self.optimizer_spec, self.scheduler_spec, grad_clip_max_norm
        )

        # train state: variables + opt_state + step
        variables = model.variables
        self.state = {
            "variables": variables,
            "opt_state": self.tx.init(variables["params"]),
            "step": jnp.asarray(0, jnp.int32),
        }

        self.finished_iterations = 0
        self.saver_all = TrainStateSaver(self.checkpoints_dir, max_to_keep=3)
        self.saver_weights_only = WeightsOnlySaver(self.weights_only_checkpoints_dir)
        self._restore_state()
        self._start_iteration = self.finished_iterations

        self._train_step = self._build_train_step()

        if self.verbose:
            logging.info(str(self))

    @property
    def name(self):
        return type(self).__name__

    def __str__(self):
        ret = f"{self.name} with settings:"
        ret += f"\n\tOutput directory: {self.out_dir}"
        ret += f"\n\tModel: {getattr(self.model, 'name', type(self.model).__name__)}"
        ret += f"\n\tModel parameter count: {self.model.num_parameters()}"
        ret += f"\n\tDataset: {self.dataset.name} ({len(self.dataset)} samples)"
        ret += f"\n\tOptimizer: {self.optimizer_spec.name} (lr {self.optimizer_spec.lr})"
        ret += f"\n\tScheduler: {self.scheduler_spec.name if self.scheduler_spec else None}"
        ret += f"\n\tGrad clip max norm: {self.grad_clip_max_norm}"
        ret += f"\n\tLoss: {self.loss.name}"
        ret += f"\n\tBatch size: {self.batch_size}"
        ret += f"\n\tInputs: {self.inputs}"
        ret += f"\n\tFinished iterations: {self.finished_iterations}"
        ret += f"\n\tMax iterations: {self.max_iterations}"
        return ret

    def _init_dirs(self):
        self.log_file_path = osp.join(self.out_dir, "log.txt")
        self.artifacts_dir = osp.join(self.out_dir, "artifacts")
        self.checkpoints_dir = osp.join(self.out_dir, "checkpoints")
        self.weights_only_checkpoints_dir = osp.join(self.out_dir, "weights_only_checkpoints_dir")
        for d in (self.out_dir, self.artifacts_dir, self.checkpoints_dir, self.weights_only_checkpoints_dir):
            os.makedirs(d, exist_ok=True)
        logging.add_log_file(self.log_file_path, flush_line=True)

    # ------------------------------------------------------------------

    def _build_train_step(self):
        loss_obj = self.loss
        tx = self.tx
        model = self.model

        # batch-stats BN training (reference model.train() semantics,
        # rmvd/models/helpers.py:156-160): the model exposes a mutable
        # apply that also returns updated running statistics, threaded
        # through the step into the next state's variables
        mutable_bn = bool(getattr(model, "has_mutable_bn", False)) and hasattr(
            model, "apply_fn_mutable"
        )

        def step_fn(state, sample_inputs, sample_gt):
            variables = state["variables"]
            step = state["step"]

            def loss_fn(params):
                vars_in = dict(variables)
                vars_in["params"] = params
                if mutable_bn:
                    (pred, aux), new_stats = model.apply_fn_mutable(
                        vars_in, **sample_inputs
                    )
                else:
                    pred, aux = model.apply_fn(vars_in, **sample_inputs)
                    new_stats = None
                total, sub_losses, _ = loss_obj(
                    sample_inputs, sample_gt, pred, aux, iteration=step, params=params
                )
                return total, (sub_losses, new_stats)

            (total, (sub_losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(variables["params"])
            updates, new_opt_state = tx.update(
                grads, state["opt_state"], variables["params"]
            )
            import optax

            new_params = optax.apply_updates(variables["params"], updates)
            new_variables = dict(variables)
            new_variables["params"] = new_params
            if mutable_bn and new_stats is not None:
                new_variables["batch_stats"] = jax.lax.stop_gradient(new_stats)
            new_state = {
                "variables": new_variables,
                "opt_state": new_opt_state,
                "step": step + 1,
            }
            return new_state, total, sub_losses

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh
            repl = NamedSharding(mesh, P())
            batched = NamedSharding(mesh, P("data"))

            multi_process = jax.process_count() > 1

            def shard_batch(x):
                if not (hasattr(x, "ndim") and x.ndim > 0):
                    return x
                if multi_process:
                    # each process contributes its local batch as one shard
                    # of the global batch (global B = local B * processes);
                    # device_put of host-local values to a global sharding
                    # would instead assert identical data on every process
                    return jax.make_array_from_process_local_data(
                        batched, np.asarray(x)
                    )
                return jax.device_put(x, batched)

            jitted = jax.jit(
                step_fn,
                in_shardings=(repl, None, None),
                out_shardings=(repl, repl, repl),
            )

            def run(state, sample_inputs, sample_gt):
                sample_inputs = jax.tree_util.tree_map(shard_batch, sample_inputs)
                sample_gt = jax.tree_util.tree_map(shard_batch, sample_gt)
                return jitted(state, sample_inputs, sample_gt)

            return run

        return jax.jit(step_fn)

    def _prepare_batch(self, sample):
        """Batched CHW numpy sample dict -> device-ready channel-last arrays."""
        for aug in self.batch_augmentations:
            aug(sample)

        inputs = {}
        gt = {}
        is_input = lambda key: key in self.inputs or key == "keyview_idx"

        images = np.stack(sample["images"], axis=1)  # (B, V, 3, H, W)
        inputs["images"] = jnp.asarray(images.transpose(0, 1, 3, 4, 2))
        if "poses" in self.inputs and "poses" in sample:
            inputs["poses"] = jnp.asarray(np.stack(sample["poses"], axis=1))
        if "intrinsics" in self.inputs and "intrinsics" in sample:
            inputs["intrinsics"] = jnp.asarray(np.stack(sample["intrinsics"], axis=1))
        if "depth_range" in self.inputs and "depth_range" in sample:
            dr = sample["depth_range"]
            inputs["depth_range"] = (jnp.asarray(dr[0]), jnp.asarray(dr[1]))
        inputs["keyview_idx"] = jnp.asarray(
            np.asarray(sample["keyview_idx"]).reshape(-1), jnp.int32
        )

        for key in ("depth", "invdepth"):
            if key in sample:
                gt[key] = jnp.asarray(
                    np.asarray(sample[key]).transpose(0, 2, 3, 1)
                )  # (B, H, W, 1)
        return inputs, gt

    # ------------------------------------------------------------------

    def __call__(self):
        if self.finished_iterations >= self.max_iterations:
            logging.info("Training already finished.")
            return self.state

        logging.info(f"Starting training {self.name}.")

        steps_since_print = 0
        start_print = time.time()
        last_checkpoint_time = time.time()
        loss_val = None

        while self.finished_iterations < self.max_iterations:
            for sample in self.dataloader:
                with writer.TimeWriter(
                    name="00_overview/train_sec_iter",
                    step=self.finished_iterations,
                    write=self.finished_iterations % self.log_loss_interval == 0,
                    avg_over_steps=True,
                    update_eta=True,
                    max_iterations=self.max_iterations,
                ):
                    sample_inputs, sample_gt = self._prepare_batch(sample)
                    self.state, loss_val, sub_losses = self._train_step(
                        self.state, sample_inputs, sample_gt
                    )

                steps_since_print += 1
                if self.finished_iterations % self.print_interval == 0:
                    loss_f = float(jax.device_get(loss_val))
                    dt = (time.time() - start_print) / steps_since_print
                    logging.info(
                        f"Iteration {self.finished_iterations}/{self.max_iterations} - "
                        f"{dt:1.4f} sec per iteration - loss: {loss_f:1.5f}"
                    )
                    start_print = time.time()
                    steps_since_print = 0

                if self.finished_iterations % self.log_interval == 0:
                    self._log_all(sample_inputs, sample_gt, loss_val, sub_losses)
                elif self.finished_iterations % self.log_loss_interval == 0:
                    self._log_loss(loss_val, sub_losses)

                self.finished_iterations += 1

                if (
                    self._start_iteration
                    < self.finished_iterations
                    < self.max_iterations
                    and time.time() - last_checkpoint_time
                    > 60 * self.save_checkpoint_interval_min
                ):
                    self._save_all()
                    last_checkpoint_time = time.time()

                writer.write_out_storage()

                if self.finished_iterations >= self.max_iterations:
                    break

        self._write_checkpoints()
        logging.info(f"Finished training {self.name}.")
        return self.state

    def _log_all(self, sample_inputs, sample_gt, loss_val, sub_losses):
        """Rich interval logging: losses, inputs, predictions and parameter

        histograms (reference: multi_view_depth_training.py:366-487)."""
        self._log_loss(loss_val, sub_losses)
        step = self.finished_iterations

        try:
            from ..utils.vis import colormap_2d

            pred, aux = self.model.apply_fn(
                self.state["variables"], **sample_inputs
            )
            img0 = np.asarray(sample_inputs["images"][0, 0])  # (H, W, 3)
            writer.put_tensor(
                "00_inputs/key_image",
                np.clip((img0 - img0.min()) / (np.ptp(img0) + 1e-9) * 255, 0, 255).astype(
                    np.uint8
                ),
                step=step,
            )
            if "depth" in sample_gt:
                writer.put_tensor(
                    "01_gt/depth", colormap_2d(np.asarray(sample_gt["depth"][0, ..., 0])), step=step
                )
            if "depth" in pred:
                writer.put_tensor(
                    "02_pred/depth", colormap_2d(np.asarray(pred["depth"][0, ..., 0])), step=step
                )
        except Exception:
            pass

        params = jax.device_get(self.state["variables"].get("params", {}))
        for top, subtree in params.items() if isinstance(params, dict) else []:
            leaves = jax.tree_util.tree_leaves(subtree)
            if leaves:
                flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
                writer.put_histogram(f"03_params/{top}", flat, step=step)
                writer.put_scalar(
                    f"03_params/{top}_norm", float(np.linalg.norm(flat)), step=step
                )

    def _log_loss(self, loss_val, sub_losses):
        step = self.finished_iterations
        writer.put_scalar("01_loss/total", jax.device_get(loss_val), step=step)
        for name, val in sub_losses.items():
            writer.put_scalar(f"01_loss/{name}", jax.device_get(val), step=step)
        writer.put_scalar(
            "00_overview/lr", float(self.schedule(step)), step=step
        )

    # ------------------------------------------------------------------

    def _save_all(self):
        # the train state is fully replicated, so on multi-host setups
        # process 0 alone writes the checkpoint (two uncoordinated orbax
        # writers racing on the same snapshot path would corrupt it)
        if jax.process_index() != 0:
            return
        state = jax.device_get(self.state)
        path = self.saver_all.save(state, self.finished_iterations)
        logging.info(f"Saved checkpoint {path}.")

    def _write_checkpoints(self):
        self._save_all()
        if jax.process_index() == 0:
            self.saver_weights_only.save(
                jax.device_get(self.state["variables"]), self.finished_iterations
            )
        # keep model variables in sync for subsequent evaluation
        self.model.variables = jax.device_get(self.state["variables"])

    def _restore_state(self):
        restored = None
        if self.saver_all.has_snapshot():
            template = jax.device_get(self.state)
            state, iteration = self.saver_all.restore(template)
            if state is not None:
                restored = (state, int(iteration))

        if jax.process_count() > 1:
            # only process 0 writes checkpoints (_save_all), so on a
            # host-local (non-shared) checkpoints_dir the other processes
            # would see no snapshot and resume at iteration 0 while
            # process 0 resumes at N — diverging the replicated state and
            # hanging the first collective. Broadcast process 0's restore
            # decision (state + iteration) to every process instead.
            from jax.experimental import multihost_utils

            local_state = restored[0] if restored else jax.device_get(self.state)
            local_iter = np.asarray(restored[1] if restored else 0, np.int32)
            state = jax.device_get(multihost_utils.broadcast_one_to_all(local_state))
            iteration = int(multihost_utils.broadcast_one_to_all(local_iter))
            restored = (state, iteration) if iteration > 0 else None
            if restored is None:
                # still adopt process 0's (identical-by-seed) init state so
                # all processes are bit-identical from the start
                self.state = state

        if restored is not None:
            self.state, self.finished_iterations = restored
            self.model.variables = self.state["variables"]
            logging.info(
                f"Restored checkpoint at iteration {self.finished_iterations}."
            )
