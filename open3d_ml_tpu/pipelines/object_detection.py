"""Object detection pipeline: train / validate (mAP) / test / inference.

Rebuild of /root/reference/ml3d/torch/pipelines/object_detection.py:46-594,
mesh-native: the reference wraps the model in DistributedDataParallel with
per-rank spawned processes (:302-344); here the jitted train step is sharded
over the mesh "data" axis and XLA emits the gradient all-reduce. Validation
gathers per-frame BEVBox3D dicts on the host and computes KITTI mAP (BEV +
3D) exactly like the reference (:222-270).
"""

import logging
from datetime import datetime
from os.path import exists, join
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..dataloaders import BatchLoader, DefaultBatcher, PointCloudDataloader
from ..datasets.utils import BEVBox3D
from ..metrics import mAP
from ..parallel import batch_sharding, replicate, replicated_sharding
from ..utils import PIPELINE, get_runid, make_dir
from .base_pipeline import BasePipeline
from .semantic_segmentation import TrainState

log = logging.getLogger(__name__)


class ObjectDetection(BasePipeline):

    def __init__(self,
                 model,
                 dataset=None,
                 name="ObjectDetection",
                 main_log_dir="./logs/",
                 device="tpu",
                 split="train",
                 **kwargs):
        super().__init__(model=model,
                         dataset=dataset,
                         name=name,
                         main_log_dir=main_log_dir,
                         device=device,
                         split=split,
                         **kwargs)
        self.net = model.get_net()
        # run_valid/run_test/run_inference ride the model's EXACT eval net
        # (e.g. PointPillars' reference-cap 'compact' pillarization) —
        # same parameter tree as the training net, different execution
        # path. Mirrors SemanticSegmentation.run_test's get_eval_net use.
        self.eval_net = model.get_eval_net()

    # --------------------------------------------------------------- helpers

    def _device_batch(self, batch):
        arrays = {
            k: v for k, v in batch["data"].items()
            if isinstance(v, np.ndarray)
        }
        return self._shard_arrays(arrays)

    def _init_state(self, sample_batch, tx):
        key = jax.random.PRNGKey(
            int(self.rng.integers(np.iinfo(np.int32).max)))
        variables = self.net.init({"params": key}, sample_batch,
                                  training=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _make_train_step(self, tx):
        model = self.model
        net = self.net

        def train_step(state, batch, rng_key):
            def loss_fn(params):
                results, updates = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, training=True, mutable=["batch_stats"],
                    rngs={"dropout": rng_key,
                          "sampling": jax.random.fold_in(rng_key, 1)})
                losses = model.get_loss(results, batch)
                total = sum(losses.values())
                return total, (updates["batch_stats"], losses)

            (loss, (new_bs, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, step=state.step + 1)
            return new_state, loss, losses

        return jax.jit(train_step, donate_argnums=(0,))

    def _make_infer_fn(self):
        net = self.eval_net

        def infer(params, batch_stats, batch):
            return net.apply({"params": params, "batch_stats": batch_stats},
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

        train_dataset = dataset.get_split("training")
        train_split = PointCloudDataloader(
            dataset=train_dataset,
            preprocess=model.preprocess,
            transform=model.transform,
            use_cache=dataset.cfg.use_cache,
            steps_per_epoch=dataset.cfg.get("steps_per_epoch_train", None))

        batcher = DefaultBatcher()
        tx, _ = model.get_optimizer(cfg)

        init_loader = BatchLoader(train_split, cfg.batch_size, batcher,
                                  num_workers=0)
        sample_batch = next(iter(init_loader))
        device_sample = self._device_batch(sample_batch)
        state = replicate(self._init_state(device_sample, tx), self.mesh)

        first_epoch = self.load_ckpt(model.cfg.ckpt_path,
                                     is_resume=model.cfg.get(
                                         "is_resume", True))
        if first_epoch > 0 and self._staged_ckpt is not None:
            state = TrainState(
                params=replicate(self._staged_ckpt["params"], self.mesh),
                batch_stats=replicate(self._staged_ckpt["batch_stats"],
                                      self.mesh),
                opt_state=state.opt_state, step=state.step)

        writer = self._make_writer(dataset)
        train_step = self._make_train_step(tx)

        log.info("Started training")
        for epoch in range(first_epoch, cfg.max_epoch + 1):
            log.info(f"=== EPOCH {epoch:d}/{cfg.max_epoch:d} ===")
            self.losses = {}
            loader = BatchLoader(train_split, cfg.batch_size, batcher,
                                 num_workers=cfg.get("num_workers", 2),
                                 drop_last=True)
            for step, batch in enumerate(loader):
                dev_batch = self._device_batch(batch)
                key = jax.random.PRNGKey(epoch * 100003 + step)
                state, loss, losses = train_step(state, dev_batch, key)
                for k, v in losses.items():
                    self.losses.setdefault(k, []).append(float(v))

            for k, v in self.losses.items():
                writer.add_scalar(f"train/{k}", float(np.mean(v)), epoch)
                log.info(f"{k}: {np.mean(v):.4f}")

            if (epoch % cfg.get("validation_freq", 1)) == 0:
                self.state = state
                self.run_valid(epoch=epoch, writer=writer)
            if epoch % cfg.save_ckpt_freq == 0 or epoch == cfg.max_epoch:
                self.save_ckpt(state, epoch)
        self.state = state
        return state

    # ------------------------------------------------------------- valid/test

    def run_valid(self, epoch=0, writer=None):
        """mAP validation (reference run_valid :133-270)."""
        model = self.model
        dataset = self.dataset
        cfg = self.cfg
        if not hasattr(self, "state"):
            raise RuntimeError("No trained state; run_train or load_ckpt.")

        valid_dataset = dataset.get_split("validation")
        valid_split = PointCloudDataloader(dataset=valid_dataset,
                                           preprocess=model.preprocess,
                                           transform=model.transform,
                                           use_cache=dataset.cfg.use_cache)
        batcher = DefaultBatcher()
        loader = BatchLoader(valid_split,
                             cfg.get("val_batch_size", cfg.batch_size),
                             batcher,
                             num_workers=cfg.get("num_workers", 2))
        infer = self._make_infer_fn()

        pred = []
        gt = []
        for batch in loader:
            dev_batch = self._device_batch(batch)
            results = infer(self.state.params, self.state.batch_stats,
                            dev_batch)
            boxes_batch = model.inference_end(results, batch["data"])
            for i, boxes in enumerate(boxes_batch):
                pred.append(BEVBox3D.to_dicts(boxes))
                gt.append(BEVBox3D.to_dicts(batch["data"]["bbox_objs"][i]))

        if len(pred) == 0:
            return None

        sim_classes = cfg.get("similar_classes", {})
        difficulties = cfg.get("difficulties", [0])
        overlaps = cfg.get("overlaps", [0.5])

        ap_bev = mAP(pred, gt, model.classes, difficulties, overlaps,
                     bev=True, similar_classes=sim_classes)
        ap_3d = mAP(pred, gt, model.classes, difficulties, overlaps,
                    bev=False, similar_classes=sim_classes)

        log.info("=== mAP BEV ===")
        for i, c in enumerate(model.classes):
            log.info(f"{c}: {ap_bev[i].mean():.2f}")
        log.info(f"Overall: {ap_bev.mean():.2f}")
        log.info("=== mAP 3D ===")
        for i, c in enumerate(model.classes):
            log.info(f"{c}: {ap_3d[i].mean():.2f}")
        log.info(f"Overall: {ap_3d.mean():.2f}")

        if writer is not None:
            writer.add_scalar("valid/mAP_BEV", float(ap_bev.mean()), epoch)
            writer.add_scalar("valid/mAP_3D", float(ap_3d.mean()), epoch)
        self.valid_map_bev = float(ap_bev.mean())
        self.valid_map_3d = float(ap_3d.mean())
        return ap_bev, ap_3d

    def run_test(self):
        """Inference over the test split, saving KITTI-format results."""
        model = self.model
        dataset = self.dataset
        cfg = self.cfg
        self.load_ckpt(model.cfg.ckpt_path)

        test_dataset = dataset.get_split("test")
        test_split = PointCloudDataloader(dataset=test_dataset,
                                          preprocess=model.preprocess,
                                          transform=model.transform,
                                          use_cache=False)
        batcher = DefaultBatcher()
        loader = BatchLoader(test_split,
                             cfg.get("test_batch_size", 1), batcher,
                             num_workers=cfg.get("num_workers", 2))
        if not hasattr(self, "state"):
            sample = next(iter(BatchLoader(test_split, 1, batcher,
                                           num_workers=0)))
            tx = optax.identity()
            self.state = replicate(
                self._init_state(self._device_batch(sample), tx), self.mesh)
            if self._staged_ckpt is not None:
                self.state = TrainState(
                    params=replicate(self._staged_ckpt["params"], self.mesh),
                    batch_stats=replicate(
                        self._staged_ckpt["batch_stats"], self.mesh),
                    opt_state=self.state.opt_state, step=self.state.step)
        infer = self._make_infer_fn()
        results_all, attrs_all = [], []
        for batch in loader:
            dev_batch = self._device_batch(batch)
            results = infer(self.state.params, self.state.batch_stats,
                            dev_batch)
            boxes_batch = self.model.inference_end(results, batch["data"])
            results_all.extend(boxes_batch)
            # un-collate the attr dict-of-lists back to per-sample dicts
            attr = batch["attr"]
            keys = list(attr.keys())
            n = len(attr[keys[0]])
            attrs_all.extend(
                [{k: attr[k][i] for k in keys} for i in range(n)])
        dataset.save_test_result(results_all, attrs_all)
        return results_all

    def run_inference(self, data):
        """Detect objects in one in-memory frame dict."""
        model = self.model
        batcher = DefaultBatcher()
        pre = model.preprocess(data, {"split": "test"})
        t = model.transform(pre, {"split": "test"})
        batch = batcher.collate_fn([{"data": t, "attr": {"split": "test"}}])
        dev_batch = self._device_batch(batch)
        if not hasattr(self, "state"):
            tx = optax.identity()
            self.state = replicate(self._init_state(dev_batch, tx),
                                   self.mesh)
        infer = self._make_infer_fn()
        results = infer(self.state.params, self.state.batch_stats, dev_batch)
        return self.model.inference_end(results, batch["data"])[0]

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
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, ckpt, force=True)
        log.info(f"Epoch {epoch:3d}: save ckpt to {path}")

    def load_ckpt(self, ckpt_path=None, is_resume=True):
        self._staged_ckpt = None
        if ckpt_path is None and is_resume:
            cands = sorted(Path(self._ckpt_dir()).glob("ckpt_*"))
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
        if hasattr(self, "state"):
            self.state = TrainState(
                params=replicate(self._staged_ckpt["params"], self.mesh),
                batch_stats=replicate(self._staged_ckpt["batch_stats"],
                                      self.mesh),
                opt_state=self.state.opt_state, step=self.state.step)
        return int(self._staged_ckpt.get("epoch", 0)) + 1

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
        log.info(f"Writing summary in {self.tensorboard_dir}.")
        return writer


PIPELINE._register_module(ObjectDetection)
