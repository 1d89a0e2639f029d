"""Semantic segmentation pipeline: train / test / inference.

Rebuild of /root/reference/ml3d/torch/pipelines/semantic_segmentation.py:
122-721, redesigned for TPU:

* all per-step device work (forward, loss, grads, optimizer update, confusion
  matrix) lives in ONE jitted function,
* data parallelism is built in from step one: batches are sharded over the
  mesh "data" axis, parameters replicated; XLA inserts gradient all-reduces
  over ICI (the reference explicitly lacks distributed semseg,
  base_pipeline.py:44-47),
* host preprocessing streams via a prefetching BatchLoader,
* checkpoints are orbax with the same {params, opt_state, epoch} layout,
* test keeps the reference's possibility-map patch loop with EMA prob fusion
  and projection to the full cloud (semantic_segmentation.py:189-316).
"""

import logging
from datetime import datetime
from os.path import exists, join
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..dataloaders import BatchLoader, DefaultBatcher, PointCloudDataloader
from ..datasets import InferenceDummySplit
from ..modules.losses import SemSegLoss
from ..modules.metrics import SemSegMetric
from ..modules.metrics.semseg_metric import confusion_matrix_device
from ..parallel import batch_sharding, replicate, replicated_sharding
from ..utils import PIPELINE, get_runid, make_dir
from .base_pipeline import BasePipeline

log = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    """Replicated training state threaded through the jitted step.

    consts holds non-trainable variable collections beyond batch_stats
    (e.g. KPConv "kp_points" kernel dispositions) — merged back into the
    variables dict at every apply, never touched by the optimizer.
    """
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array
    consts: dict = struct.field(default_factory=FrozenDict)


class SemanticSegmentation(BasePipeline):
    """Train/eval/test loops for point cloud semantic segmentation."""

    def __init__(self,
                 model,
                 dataset=None,
                 name="SemanticSegmentation",
                 batch_size=4,
                 val_batch_size=4,
                 test_batch_size=1,
                 max_epoch=100,
                 learning_rate=1e-2,
                 lr_decays=0.95,
                 save_ckpt_freq=20,
                 adam_lr=1e-2,
                 scheduler_gamma=0.95,
                 momentum=0.98,
                 main_log_dir="./logs/",
                 device="tpu",
                 split="train",
                 train_sum_dir="train_log",
                 num_workers=2,
                 **kwargs):
        super().__init__(model=model,
                         dataset=dataset,
                         name=name,
                         batch_size=batch_size,
                         val_batch_size=val_batch_size,
                         test_batch_size=test_batch_size,
                         max_epoch=max_epoch,
                         learning_rate=learning_rate,
                         lr_decays=lr_decays,
                         save_ckpt_freq=save_ckpt_freq,
                         adam_lr=adam_lr,
                         scheduler_gamma=scheduler_gamma,
                         momentum=momentum,
                         main_log_dir=main_log_dir,
                         device=device,
                         split=split,
                         train_sum_dir=train_sum_dir,
                         num_workers=num_workers,
                         **kwargs)
        self.net = model.get_net()
        self._jit_cache = {}

    # --------------------------------------------------------------- helpers

    def _init_state(self, sample_batch, tx):
        key = jax.random.PRNGKey(
            int(self.rng.integers(np.iinfo(np.int32).max)))
        variables = self.net.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            sample_batch, training=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        consts = FrozenDict({k: v for k, v in variables.items()
                             if k not in ("params", "batch_stats")})
        opt_state = tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                          consts=consts)

    def _device_batch(self, batch):
        """Ship the numpy batch to devices, sharded over the data axis."""
        arrays = {
            k: v for k, v in batch["data"].items()
            if isinstance(v, np.ndarray) or
            (isinstance(v, list) and len(v) and isinstance(v[0], np.ndarray))
        }
        return self._shard_arrays(arrays)

    def _make_train_step(self, Loss, tx):
        model = self.model
        net = self.net
        num_classes = model.cfg.num_classes
        grad_clip = model.cfg.get("grad_clip_norm", -1)

        def train_step(state, batch, dropout_key):
            def loss_fn(params):
                # "p2p_reg" collects per-deformable-conv fitting terms sown
                # by KPConvOp (absent for every other model)
                results, updates = net.apply(
                    {"params": params, "batch_stats": state.batch_stats,
                     **state.consts},
                    batch, training=True,
                    mutable=["batch_stats", "p2p_reg"],
                    rngs={"dropout": dropout_key})
                loss, labels, scores = model.get_loss(Loss, results, batch)
                loss = loss + model.regularizer_loss(updates)
                return loss, (updates["batch_stats"], labels, scores)

            (loss, (new_bs, labels, scores)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if grad_clip and grad_clip > 0:
                # reference clips by value (semantic_segmentation.py:425)
                grads = jax.tree.map(
                    lambda g: jnp.clip(g, -grad_clip, grad_clip), grads)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            _, valid = model.get_valid_mask(batch) if hasattr(
                model, "get_valid_mask") else (None, None)
            cm = confusion_matrix_device(
                scores, labels,
                valid if valid is not None else jnp.ones(labels.shape, bool),
                num_classes)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, step=state.step + 1,
                                   consts=state.consts)
            return new_state, loss, cm

        return jax.jit(train_step, donate_argnums=(0,))

    def _make_eval_step(self, Loss):
        model = self.model
        net = self.net
        num_classes = model.cfg.num_classes

        def eval_step(state, batch):
            results = net.apply(
                {"params": state.params, "batch_stats": state.batch_stats,
                 **state.consts},
                batch, training=False)
            loss, labels, scores = model.get_loss(Loss, results, batch)
            cm = confusion_matrix_device(scores, labels,
                                         jnp.ones(labels.shape, bool),
                                         num_classes)
            return loss, cm, results

        return jax.jit(eval_step)

    def _make_infer_fn(self):
        # run_test/run_inference go through the model's EVAL net: exact
        # neighbor paths unless the config's eval_knn_method says otherwise
        # (parameter trees are shared across paths, see BaseModel).
        net = self.model.get_eval_net()

        def infer(params, batch_stats, consts, batch):
            return net.apply(
                {"params": params, "batch_stats": batch_stats, **consts},
                batch, training=False)

        return jax.jit(infer)

    # ----------------------------------------------------------------- train

    def run_train(self):
        model = self.model
        dataset = self.dataset
        cfg = self.cfg

        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        log_file_path = join(cfg.logs_dir, "log_train_" + timestamp + ".txt")
        log.info(f"Logging in file : {log_file_path}")
        log.addHandler(logging.FileHandler(log_file_path))
        log.info(f"Mesh: {self.mesh}")

        Loss = SemSegLoss(self, model, dataset)
        self.metric_train = SemSegMetric()
        self.metric_val = SemSegMetric()

        train_dataset = dataset.get_split("train")
        train_sampler = train_dataset.sampler
        train_split = PointCloudDataloader(
            dataset=train_dataset,
            preprocess=model.preprocess,
            transform=model.transform,
            sampler=train_sampler,
            use_cache=dataset.cfg.use_cache,
            steps_per_epoch=dataset.cfg.get("steps_per_epoch_train", None))

        valid_dataset = dataset.get_split("validation")
        valid_sampler = valid_dataset.sampler
        valid_split = PointCloudDataloader(
            dataset=valid_dataset,
            preprocess=model.preprocess,
            transform=model.transform,
            sampler=valid_sampler,
            use_cache=dataset.cfg.use_cache,
            steps_per_epoch=dataset.cfg.get("steps_per_epoch_valid", None))

        batcher = DefaultBatcher()
        steps_per_epoch = max(len(train_split) // cfg.batch_size, 1)
        cfg.cfg_dict["steps_per_epoch"] = steps_per_epoch
        tx, _ = model.get_optimizer(cfg)

        # init from one real batch
        model.trans_point_sampler = train_sampler.get_point_sampler()
        init_loader = BatchLoader(train_split, cfg.batch_size, batcher,
                                  num_workers=0, sampler=train_sampler)
        sample_batch = next(iter(init_loader))
        device_sample = self._device_batch(sample_batch)
        state = replicate(self._init_state(device_sample, tx), self.mesh)

        first_epoch = self.load_ckpt(model.cfg.ckpt_path,
                                     is_resume=model.cfg.get(
                                         "is_resume", True))
        if first_epoch > 0:
            state = self._restore_state(state, tx)

        writer = self._make_writer(dataset)
        train_step = self._make_train_step(Loss, tx)
        eval_step = self._make_eval_step(Loss)
        base_key = jax.random.PRNGKey(
            int(self.rng.integers(np.iinfo(np.int32).max)))

        log.info("Started training")
        for epoch in range(first_epoch, cfg.max_epoch + 1):
            log.info(f"=== EPOCH {epoch:d}/{cfg.max_epoch:d} ===")
            self.metric_train.reset()
            self.metric_val.reset()
            self.losses = []
            model.trans_point_sampler = train_sampler.get_point_sampler()
            train_loader = BatchLoader(train_split, cfg.batch_size, batcher,
                                       num_workers=cfg.get("num_workers", 2),
                                       sampler=train_sampler,
                                       drop_last=True)

            record_for = (cfg.get("summary") or {}).get("record_for",
                                                        []) or []
            for step, batch in enumerate(train_loader):
                dev_batch = self._device_batch(batch)
                key = jax.random.fold_in(base_key,
                                         epoch * steps_per_epoch + step)
                state, loss, cm = train_step(state, dev_batch, key)
                self.metric_train.update_cm(cm)
                self.losses.append(float(loss))
                if step == 0 and "train" in record_for:
                    from .summaries import record_summary
                    results = eval_step(state, dev_batch)[2]
                    record_summary(
                        writer, cfg.get("summary"), "train", "semseg",
                        batch["data"], np.asarray(results), epoch,
                        getattr(dataset, "label_to_names", None))

            # validation
            model.trans_point_sampler = valid_sampler.get_point_sampler()
            valid_loader = BatchLoader(valid_split, cfg.val_batch_size,
                                       batcher,
                                       num_workers=cfg.get("num_workers", 2),
                                       sampler=valid_sampler,
                                       drop_last=True)
            self.valid_losses = []
            for step, batch in enumerate(valid_loader):
                dev_batch = self._device_batch(batch)
                loss, cm, _ = eval_step(state, dev_batch)
                self.metric_val.update_cm(cm)
                self.valid_losses.append(float(loss))

            self.save_logs(writer, epoch)
            if epoch % cfg.save_ckpt_freq == 0 or epoch == cfg.max_epoch:
                self.save_ckpt(state, epoch)

        self.state = state
        return state

    # ------------------------------------------------------------------ test

    def run_test(self):
        model = self.model
        dataset = self.dataset
        cfg = self.cfg
        self.load_ckpt(model.cfg.ckpt_path)

        test_dataset = dataset.get_split("test")
        test_sampler = test_dataset.sampler
        test_split = PointCloudDataloader(dataset=test_dataset,
                                          preprocess=model.preprocess,
                                          transform=model.transform,
                                          sampler=test_sampler,
                                          use_cache=dataset.cfg.use_cache)
        if not hasattr(self, "state") or self.state is None:
            # fresh process: initialize a state, then overlay the staged ckpt
            self._ensure_state_for_inference(test_split, test_sampler)
            self.state = self._apply_staged(self.state)
        self.run_test_on_split(test_split, test_sampler, save_results=True)

    def run_test_on_split(self, test_split, test_sampler, save_results=False):
        """Possibility-map patch loop (reference run_test :189-269)."""
        model = self.model
        dataset = self.dataset
        cfg = self.cfg
        metric = SemSegMetric()
        infer_fn = self._make_infer_fn()
        state = self.state
        batcher = DefaultBatcher()

        test_sampler.initialize_with_dataloader(test_split)
        model.trans_point_sampler = test_sampler.get_point_sampler()

        num_clouds = len(test_split.dataset)
        test_probs = {}
        results_per_cloud = {}
        test_bs = int(cfg.get("test_batch_size", 1) or 1)

        cloud_iter = test_sampler.get_cloud_sampler()
        done = False
        while not done:
            # batch several patches per device call; the host-side sampler
            # updates possibilities between draws so patches tile the
            # remaining uncovered regions (and can span multiple clouds)
            samples, cloud_ids = [], []
            for _ in range(test_bs):
                try:
                    cid = next(cloud_iter)
                except StopIteration:
                    done = True
                    break
                samples.append(test_split[cid])
                cloud_ids.append(cid)
            if not samples:
                break
            batch = batcher.collate_fn(samples)
            dev_batch = self._device_batch(batch)
            results = np.asarray(
                infer_fn(state.params, state.batch_stats, state.consts,
                         dev_batch))

            for cid in set(cloud_ids):
                if cid not in test_probs:
                    n = test_sampler.possibilities[cid].shape[0]
                    test_probs[cid] = np.zeros(
                        (n, model.cfg.num_classes), np.float16)
            for j, cid in enumerate(cloud_ids):
                test_probs[cid] = model.update_probs(
                    {k: v[j:j + 1] for k, v in batch["data"].items()},
                    results[j:j + 1], test_probs[cid])
            remaining = [
                cid for cid in set(cloud_ids)
                if cid not in results_per_cloud
            ]
            for cloud_id in remaining:
                self._maybe_finalize_cloud(cloud_id, test_split,
                                           test_sampler, test_probs,
                                           results_per_cloud, save_results)
        self.test_results = results_per_cloud
        return results_per_cloud

    def _maybe_finalize_cloud(self, cloud_id, test_split, test_sampler,
                              test_probs, results_per_cloud, save_results):
        """When a cloud is fully covered, project the accumulated probs to
        the full cloud and store/save the prediction."""
        model = self.model
        dataset = self.dataset
        if test_sampler.min_possibilities[cloud_id] <= 0.5:
            return
        attr = test_split.dataset.get_attr(cloud_id)
        data = test_split.cache_convert(attr["name"]) \
            if test_split.cache_convert else \
            model.preprocess(test_split.dataset.get_data(cloud_id), attr)
        probs = test_probs[cloud_id]
        if "proj_inds" in data:
            probs = probs[data["proj_inds"]]
        pred = probs.argmax(-1)
        results_per_cloud[cloud_id] = {
            "predict_labels": pred,
            "predict_scores": probs,
        }
        if save_results and not dataset.is_tested(attr):
            dataset.save_test_result(results_per_cloud[cloud_id], attr)

    # ------------------------------------------------------------- inference

    def run_inference(self, data):
        """Inference on one in-memory cloud dict; returns labels+scores."""
        model = self.model
        infer_split = InferenceDummySplit(data)
        test_split = PointCloudDataloader(dataset=infer_split,
                                          preprocess=model.preprocess,
                                          transform=model.transform,
                                          sampler=infer_split.sampler,
                                          use_cache=False)
        sampler = infer_split.sampler
        if not hasattr(self, "state") or self.state is None:
            self._ensure_state_for_inference(test_split, sampler)
        results = self.run_test_on_split(test_split, sampler,
                                         save_results=False)
        return results[0]

    def _ensure_state_for_inference(self, test_split, sampler):
        """Initialize (untrained) state when no checkpoint was loaded."""
        model = self.model
        batcher = DefaultBatcher()
        sampler.initialize_with_dataloader(test_split)
        model.trans_point_sampler = sampler.get_point_sampler()
        sample = test_split[0]
        batch = batcher.collate_fn([sample])
        dev_batch = self._device_batch(batch)
        tx = optax.identity()
        self.state = replicate(self._init_state(dev_batch, tx), self.mesh)
        # reset coverage so the real test loop starts fresh
        sampler.initialize_with_dataloader(test_split)

    # ------------------------------------------------------------ checkpoint

    def _ckpt_dir(self):
        path = join(self.cfg.logs_dir, "checkpoint")
        make_dir(path)
        return path

    def save_ckpt(self, state, epoch):
        import orbax.checkpoint as ocp
        path = Path(self._ckpt_dir()).absolute() / f"ckpt_{epoch:05d}"
        ckpt = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "epoch": epoch,
        }
        if state.consts:
            ckpt["consts"] = jax.device_get(state.consts)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, ckpt, force=True)
        log.info(f"Epoch {epoch:3d}: save ckpt to {path}")

    def load_ckpt(self, ckpt_path=None, is_resume=True):
        """Find + stage the latest checkpoint. Returns the first epoch."""
        self._staged_ckpt = None
        if ckpt_path is None and is_resume:
            ckpt_dir = Path(self._ckpt_dir())
            cands = sorted(ckpt_dir.glob("ckpt_*"))
            if cands:
                ckpt_path = str(cands[-1])
        if ckpt_path is None or not exists(str(ckpt_path)):
            log.info("Initializing from scratch.")
            return 0
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            self._staged_ckpt = ckptr.restore(
                str(Path(ckpt_path).absolute()))
        log.info(f"Loading checkpoint {ckpt_path}")
        epoch = int(self._staged_ckpt.get("epoch", 0))
        # If a state already exists (inference path), apply immediately.
        if hasattr(self, "state") and self.state is not None:
            self.state = self._apply_staged(self.state)
        return epoch + 1

    def _apply_staged(self, state):
        s = self._staged_ckpt
        if s is None:
            return state
        consts = (replicate(FrozenDict(s["consts"]), self.mesh)
                  if s.get("consts") else state.consts)
        return TrainState(params=replicate(s["params"], self.mesh),
                          batch_stats=replicate(s["batch_stats"], self.mesh),
                          opt_state=state.opt_state,
                          step=state.step, consts=consts)

    def _restore_state(self, state, tx):
        s = self._staged_ckpt
        if s is None:
            return state
        new = self._apply_staged(state)
        if "opt_state" in s and s["opt_state"] is not None:
            try:
                opt_state = jax.tree.unflatten(
                    jax.tree.structure(state.opt_state),
                    jax.tree.leaves(s["opt_state"]))
                new = TrainState(params=new.params,
                                 batch_stats=new.batch_stats,
                                 opt_state=replicate(opt_state, self.mesh),
                                 step=new.step, consts=new.consts)
            except Exception:
                log.warning("Could not restore optimizer state; reinit.")
        return new

    # --------------------------------------------------------------- logging

    def _make_writer(self, dataset):
        from torch.utils.tensorboard import SummaryWriter
        dataset_name = dataset.name if dataset is not None else ""
        tensorboard_dir = join(
            self.cfg.train_sum_dir,
            self.model.__class__.__name__ + "_" + dataset_name + "_jax")
        runid = get_runid(tensorboard_dir)
        self.tensorboard_dir = join(self.cfg.train_sum_dir,
                                    runid + "_" + Path(tensorboard_dir).name)
        writer = SummaryWriter(self.tensorboard_dir)
        self._save_config(writer)
        log.info(f"Writing summary in {self.tensorboard_dir}.")
        return writer

    def save_logs(self, writer, epoch):
        """Scalar logging (reference save_logs :620-663)."""
        train_accs = self.metric_train.acc()
        train_ious = self.metric_train.iou()
        valid_accs = self.metric_val.acc()
        valid_ious = self.metric_val.iou()

        loss_dict = {
            "Training loss": np.mean(self.losses) if self.losses else 0.0,
            "Validation loss":
                np.mean(self.valid_losses) if self.valid_losses else 0.0,
        }
        acc_dict = {
            "Training accuracy": train_accs[-1] if train_accs else 0.0,
            "Validation accuracy": valid_accs[-1] if valid_accs else 0.0,
        }
        iou_dict = {
            "Training IoU": train_ious[-1] if train_ious else 0.0,
            "Validation IoU": valid_ious[-1] if valid_ious else 0.0,
        }
        for key, val in {**loss_dict, **acc_dict, **iou_dict}.items():
            writer.add_scalar(key, float(np.nan_to_num(val)), epoch)
        log.info(f"Loss train: {loss_dict['Training loss']:.3f} "
                 f"eval: {loss_dict['Validation loss']:.3f}")
        log.info(f"Mean acc train: {acc_dict['Training accuracy']:.3f} "
                 f"eval: {acc_dict['Validation accuracy']:.3f}")
        log.info(f"Mean IoU train: {iou_dict['Training IoU']:.3f} "
                 f"eval: {iou_dict['Validation IoU']:.3f}")

    def _save_config(self, writer):
        from ..utils import code2md
        import sys
        writer.add_text("Description/Command line",
                        " ".join(sys.argv), 0)
        writer.add_text("Configuration",
                        code2md(self.cfg.dump(), language="yaml"), 0)


PIPELINE._register_module(SemanticSegmentation)
