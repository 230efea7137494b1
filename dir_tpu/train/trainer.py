"""Trainer: epoch loop, logging, checkpointing, in-loop eval.

Functional equivalent of the reference Trainer/Tester (train.py:103-336)
re-designed for TPU: one jitted sharded train step (forward + ~54-term
loss + backward + AdamW + BN stats as a single XLA program), host-side
threaded data loading, orbax checkpoints, per-stage metric evaluation.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dir_tpu.config import Config
from dir_tpu.data.interhand import InterHandDataset
from dir_tpu.data.loader import BatchLoader
from dir_tpu.mano.assets import ManoModel
from dir_tpu.models.dir import DIR
from dir_tpu.parallel.mesh import make_mesh, shard_batch
from dir_tpu.train import checkpoint as ckpt
from dir_tpu.train import evaluate
from dir_tpu.train.state import (TrainState, create_train_state,
                                 make_optimizer, lr_schedule)
from dir_tpu.train.steps import make_eval_step, make_train_step
from dir_tpu.utils.logger import setup_logger

_BATCH_KEYS = (
    "img", "joint_2d_left", "joint_2d_right", "mesh_2d_left", "mesh_2d_right",
    "joint_3d_left", "joint_3d_right", "mesh_3d_left", "mesh_3d_right",
    "center_left", "center_right", "seg", "dense",
)


def opt_steps_per_epoch(num_samples: int, batch_size: int,
                        grad_accum: int) -> int:
    """OPTIMIZER steps per epoch — the lr-schedule quantum. With
    grad_accum=N the state.step counter advances once per N loader
    micro-batches (one optimizer step per stacked group), so the
    micro-batch count is divided by N to keep the epoch-quantized
    cosine/step schedule on the reference's wall-epoch cadence
    (torch scheduler stepped per epoch, reference train.py:84).
    steps_per_call needs no adjustment: its scan increments step once
    per inner batch."""
    return max(1, num_samples // batch_size // max(1, grad_accum))


class Trainer:
    def __init__(self, cfg: Config, mano_left: ManoModel,
                 mano_right: ManoModel, mesh=None):
        self.cfg = cfg
        self.mano_left = mano_left
        self.mano_right = mano_right
        self.mesh = mesh if mesh is not None else make_mesh()
        os.makedirs(cfg.train.output_dir, exist_ok=True)
        self.logger = setup_logger(
            os.path.join(cfg.train.output_dir, "log"), name="dir_tpu.train")
        # reproducibility record (replaces the reference's source
        # snapshotting, train.py:117-122)
        from dir_tpu.config import save_yaml
        save_yaml(cfg, os.path.join(cfg.train.output_dir, "config.yaml"))
        self.model = DIR(cfg.model)
        self.start_epoch = 0
        self.best = float("inf")
        self.last_loss = float("nan")

    # -- setup -------------------------------------------------------------

    def _host_dataset(self, split: str, **kw):
        c = self.cfg
        ds_cls = InterHandDataset
        if c.data.packed_cache:
            from dir_tpu.data.sample_cache import CachedInterHandDataset
            ds_cls = CachedInterHandDataset
        return ds_cls(c.data.data_dir, split, self.mano_left,
                      self.mano_right, img_size=c.data.img_size, **kw)

    def make_data(self):
        c = self.cfg
        if c.data.device_pipeline:
            from dir_tpu.data.device_pipeline import (RawInterHandDataset,
                                                      make_preprocess_fn)
            self.train_ds = RawInterHandDataset(
                c.data.data_dir, "train", img_size=c.data.img_size)
            self.preprocess_train = make_preprocess_fn(
                self.mano_left, self.mano_right, img_size=c.data.img_size,
                train=True)
            # eval path too: host does JPEG decode only, GT synthesis +
            # normalization run on device (train=False: no augmentation)
            self.test_ds = RawInterHandDataset(
                c.data.data_dir, "test", img_size=c.data.img_size)
            self.preprocess_test = make_preprocess_fn(
                self.mano_left, self.mano_right, img_size=c.data.img_size,
                train=False)
            self._aug_key = jax.random.PRNGKey(c.train.seed)
        else:
            self.train_ds = self._host_dataset("train", seed=c.train.seed,
                                               native_warp=c.data.native_warp,
                                               wire8=c.data.wire8)
            self.preprocess_train = None
            self.preprocess_test = None
        if self.preprocess_test is None:
            self.test_ds = self._host_dataset("test", augment_train=False)
        self.train_loader = BatchLoader(
            self.train_ds, c.train.batch_size, shuffle=True, drop_last=True,
            num_threads=c.data.num_workers, seed=c.train.seed)
        self.test_loader = BatchLoader(
            self.test_ds, c.train.batch_size, shuffle=False, drop_last=False,
            pad_last=True, num_threads=c.data.num_workers)
        self.logger.info(
            "datasets: train=%d test=%d", len(self.train_ds),
            len(self.test_ds))

    def make_model(self, init_params=None, init_stats=None):
        c = self.cfg
        steps_per_epoch = opt_steps_per_epoch(
            len(self.train_ds), c.train.batch_size, c.train.grad_accum)
        self.tx = make_optimizer(c.train, steps_per_epoch)
        self.sched = lr_schedule(c.train, steps_per_epoch)

        img = jnp.zeros((1, c.data.img_size, c.data.img_size, 3), jnp.float32)
        # jitted init: eager init dispatches thousands of tiny device ops
        variables = jax.jit(lambda: self.model.init(
            jax.random.PRNGKey(c.train.seed), img, self.mano_left,
            self.mano_right))()
        if init_params is not None:
            variables = dict(variables)
            if c.model.backbone_stem == "s2d":
                init_params = ckpt.adapt_stem_s2d(init_params)
            variables["params"] = ckpt.prune_to_target(
                init_params, variables["params"])
            if init_stats is not None:
                variables["batch_stats"] = ckpt.prune_to_target(
                    init_stats, variables["batch_stats"])
        self.state = create_train_state(variables, self.tx)

        if ((c.train.steps_per_call > 1 or c.train.grad_accum > 1)
                and c.data.device_pipeline):
            raise ValueError(
                "steps_per_call / grad_accum > 1 require the host data "
                "path (stacked batches); disable data.device_pipeline")
        if c.train.steps_per_call > 1 and c.train.grad_accum > 1:
            raise ValueError(
                "steps_per_call and grad_accum are mutually exclusive")
        self.train_step = make_train_step(
            self.model, self.tx, c.model, self.mano_left, self.mano_right,
            mesh=self.mesh, unroll=c.train.steps_per_call,
            grad_accum=c.train.grad_accum)
        self.eval_step = make_eval_step(
            self.model, self.mano_left, self.mano_right, mesh=self.mesh)

        if c.train.continue_train and c.train.checkpoint:
            self.state = ckpt.restore_checkpoint(
                c.train.checkpoint, self.state)
            # meta.json carries the loop state the pytree doesn't:
            # epoch, best metric, device-pipeline aug key (reference
            # restores last_epoch + schedule, train.py:127-135).
            meta = ckpt.load_meta(c.train.checkpoint)
            self.start_epoch = meta.get(
                "epoch", int(self.state.step) // steps_per_epoch)
            self.best = meta.get("best", float("inf"))
            if "aug_key" in meta and hasattr(self, "_aug_key"):
                self._aug_key = jnp.asarray(meta["aug_key"],
                                            jnp.uint32)
            self.logger.info("resumed from %s at epoch %d (best %.4f)",
                             c.train.checkpoint, self.start_epoch,
                             self.best)

    # -- loops -------------------------------------------------------------

    def _call_batches(self, loader):
        """Yield per-dispatch batches: the loader's batches unchanged at
        steps_per_call=1, else stacked groups of that many consecutive
        batches (leading axis = step index; remainder dropped like
        drop_last). Each scan step consumes its own batch — identical
        math to dispatching them one by one."""
        spc = max(self.cfg.train.steps_per_call,
                  self.cfg.train.grad_accum)
        if spc <= 1:
            yield from loader
            return
        buf = []
        for b in loader:
            buf.append(b)
            if len(buf) == spc:
                yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}
                buf = []
        if buf:
            # make the coverage loss visible rather than silent: the
            # trailing partial group is dropped exactly like drop_last
            self.logger.info(
                "dropped %d trailing batch(es) not filling a group of %d",
                len(buf), spc)

    def _save_meta(self, ckpt_dir: str, epoch: int):
        meta = {"epoch": epoch + 1, "best": self.best}
        if hasattr(self, "_aug_key"):
            meta["aug_key"] = np.asarray(self._aug_key).tolist()
        ckpt.save_meta(ckpt_dir, meta)

    def train(self):
        c = self.cfg
        ckpt_dir = os.path.join(c.train.output_dir, "checkpoint")
        with self.mesh:
            for epoch in range(self.start_epoch, c.train.total_epochs):
                self.train_loader.set_epoch(epoch)
                t0 = time.perf_counter()
                for it, batch in enumerate(
                        self._call_batches(self.train_loader)):
                    if self.preprocess_train is not None:
                        raw = shard_batch(
                            {k: v for k, v in batch.items()
                             if k != "_valid"}, self.mesh)
                        self._aug_key, sub = jax.random.split(self._aug_key)
                        dev_batch = self.preprocess_train(raw, sub)
                        dev_batch = {k: dev_batch[k] for k in _BATCH_KEYS}
                    else:
                        dev_batch = shard_batch(
                            {k: batch[k] for k in _BATCH_KEYS}, self.mesh,
                            leading_steps=(c.train.steps_per_call > 1
                                           or c.train.grad_accum > 1))
                    self.state, loss_dict = self.train_step(
                        self.state, dev_batch)
                    if it % c.train.print_every == 0:
                        total = float(sum(
                            jax.tree.map(float, loss_dict).values()))
                        self.last_loss = total  # probe for tests/tools
                        lr = float(self.sched(self.state.step))
                        self.logger.info(
                            "[epoch %d][it %d] lr %.6f loss %.4f", epoch, it,
                            lr, total)
                        if not np.isfinite(total):
                            # failure detection: stop before the divergence
                            # overwrites good checkpoints
                            raise FloatingPointError(
                                f"non-finite loss at epoch {epoch} it {it};"
                                f" restart with --resume {ckpt_dir}")
                    if c.train.draw_every and it % c.train.draw_every == 0:
                        vis_batch = (dev_batch
                                     if self.preprocess_train is not None
                                     else batch)
                        if c.train.steps_per_call > 1 or c.train.grad_accum > 1:
                            # stacked call: draw the last step's batch
                            vis_batch = {k: v[-1]
                                         for k, v in vis_batch.items()}
                        self._dump_vis(vis_batch, epoch, it)
                dt = time.perf_counter() - t0
                self.logger.info("epoch %d done in %.1fs", epoch, dt)
                ckpt.save_checkpoint(ckpt_dir, self.state,
                                     int(self.state.step), "latest")
                if (c.train.eval_every_epochs
                        and epoch % c.train.eval_every_epochs == 0):
                    summary = self.evaluate()
                    err = summary["joint_mean_all_mm"]
                    if err < self.best:
                        self.best = err
                        ckpt.save_checkpoint(ckpt_dir, self.state,
                                             int(self.state.step), "best")
                self._save_meta(ckpt_dir, epoch)
        return self.best

    def _dump_vis(self, batch, epoch: int, it: int):
        """Skeleton-overlay dumps of GT vs prediction (train.py:17-55,
        77-82 equivalent). One forward of the current batch on the
        up-to-date params."""
        from dir_tpu.utils.visualize import save_prediction_grid
        vis_dir = os.path.join(self.cfg.train.output_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        out = self.eval_step(variables, shard_batch(
            jnp.asarray(batch["img"]), self.mesh))
        final = out["stages"][-1]
        size = self.cfg.data.img_size
        img = np.asarray(batch["img_rgb"][0]) if "img_rgb" in batch else (
            (np.asarray(batch["img"][0]) * 0 + 127))
        for side in ("left", "right"):
            gt = (np.asarray(batch[f"joint_2d_{side}"][0][:, :2]) + 1) \
                / 2 * size
            pd = (np.asarray(final[f"pd_joint_uv_{side}"][0]) + 1) / 2 * size
            save_prediction_grid(
                os.path.join(vis_dir, f"e{epoch}_i{it}_{side}.png"),
                img.astype(np.uint8), gt, pd)

    def evaluate(self, all_stages: bool = False) -> Dict[str, float]:
        """Run the benchmark metrics over the test split (apps/eval.py
        semantics). By default evaluates the final refinement stage; with
        ``all_stages`` logs every stage like the reference's in-loop
        test_model (train.py:177-199) and returns the final stage's
        summary."""
        jreg_l = evaluate.extended_j_regressor(self.mano_left)
        jreg_r = evaluate.extended_j_regressor(self.mano_right)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        num_stages = 3 if all_stages else 1
        accs = [dict() for _ in range(num_stages)]
        with self.mesh:
            for batch in self.test_loader:
                if self.preprocess_test is not None:
                    raw = shard_batch(
                        {k: v for k, v in batch.items() if k != "_valid"},
                        self.mesh)
                    proc = self.preprocess_test(
                        raw, jax.random.PRNGKey(0))  # key unused at eval
                    proc["_valid"] = batch["_valid"]
                    batch = proc
                img = shard_batch(batch["img"], self.mesh)
                out = self.eval_step(variables, img)
                stages = out["stages"][-num_stages:]
                valid = np.zeros(batch["img"].shape[0], np.float32)
                valid[: int(batch["_valid"])] = 1.0
                for si, stage in enumerate(stages):
                    if self.cfg.train.inloop_metric == "online":
                        # the reference Trainer's exact in-loop metric
                        # (dataset/interhand.py:262-315)
                        metrics = evaluate.online_batch_metrics(
                            stage["pd_joint_xyz_left"],
                            stage["pd_joint_xyz_right"],
                            stage["pd_mesh_xyz_left"],
                            stage["pd_mesh_xyz_right"],
                            jnp.asarray(batch["joint_3d_left"]),
                            jnp.asarray(batch["joint_3d_right"]),
                            jnp.asarray(batch["mesh_3d_left"]),
                            jnp.asarray(batch["mesh_3d_right"]),
                            jnp.asarray(valid))
                    else:
                        metrics = evaluate.batch_metrics(
                            stage["pd_mesh_xyz_left"],
                            stage["pd_mesh_xyz_right"],
                            stage["pd_offset"],
                            jnp.asarray(batch["mesh_3d_left"]),
                            jnp.asarray(batch["mesh_3d_right"]),
                            jnp.asarray(batch["camera"]),
                            jreg_l, jreg_r, jnp.asarray(valid),
                            root_joint=self.cfg.model.root_joint)
                    # one device->host transfer per batch per stage
                    # (a float() per metric would serialize ~10 tiny
                    # syncs each batch)
                    metrics = jax.device_get(metrics)
                    for k, v in metrics.items():
                        accs[si][k] = accs[si].get(k, 0.0) + float(v)
        summ = (evaluate.summarize_online
                if self.cfg.train.inloop_metric == "online"
                else evaluate.summarize)
        summaries = [summ(a) for a in accs]
        for si, summary in enumerate(summaries):
            tag = f"stage{si}" if all_stages else "final"
            for k, v in summary.items():
                self.logger.info("[%s] %s: %.4f", tag, k, v)
        return summaries[-1]
