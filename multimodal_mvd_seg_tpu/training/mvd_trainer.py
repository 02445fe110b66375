"""ContrastiveTrainer — the MVD paper's dual-branch trainer.

Parity: reference nnunetv2/training/nnUNetTrainer/MVDTrainer.py:76-1343
(ContrastiveTrainer), re-designed as ONE pjit-compiled train step containing
the full per-step pipeline (reference train_step :879-985):

  loss = DS(Dice+CE)(out1) + DS(Dice+CE)(out2)
       + λ3 · Wasserstein(cubical dgm of pred vessel, dgm of GT vessel)
       + λ1 · symmetric-KL(vessel prob₁, vessel prob₂)
       [epoch > 50]  insert high-confidence correct voxels' projected
                     features into the class-wise memory bank (:927-955)
       [epoch ≥ 100] + λ2 · (contrastive₁ + contrastive₂)  (:957-972)

λ1=0.5, λ2=0.1, λ3=1 (:132-134); SGD nesterov lr 1e-2 m=0.99 wd 3e-5,
PolyLR, 250 it/epoch, 50 val it, 200 epochs (:161-166,482-486).

TPU re-design decisions (each is a deliberate deviation from the CUDA/torch
structure, not an omission):
- the epoch-staged curriculum is a *dynamic* scalar input gated with
  lax.cond — one compiled step for all 200 epochs, no recompiles;
- the data-dependent boolean gathers (:945-948) become fixed-cap per-class
  masked samples (losses/feature_memory.sample_class_rows);
- the memory bank lives in the TrainState (device HBM), updated inside the
  same jit — no host round trips;
- the "projection head under no_grad with eval-mode BN" insert semantics
  (:949-953) = stop_gradient + use_running_average heads here;
- the topo loss runs the cubical persistence + optimal matching on host
  (the reference pays the same CPU cost through gudhi/torch_topological)
  with the vessel maps pooled by ``topo_pool`` first (``topo_pool_mode``:
  max by default, avg optional) — the documented speed knob; gradients
  reach the critical voxels by gather.
  Two equivalent execution modes (``topo_mode``): "callback" embeds the
  host work in the train jit via jax.pure_callback; "two_phase" splits the
  step into probe jit → host persistence/matching → train jit (for
  backends that reject host callbacks, e.g. the axon-tunneled bench TPU) —
  the matching is a gradient-detached constant either way, so both modes
  produce identical loss and gradients (asserted in tests);
- branch-2's contrastive call mirrors the reference's num_classes=2
  argument (:971 — deliberate mirror of the shipped behavior, see
  ``contra_classes_branch2``).

Known reference bugs NOT copied (SURVEY.md §0): undefined logits1/logits2
(:897-898 — we use the actual outputs), the commented-out-yet-used
self.topo_loss (:100/920 — ours exists), and branch-2 decoder wiring.
"""

import os
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.contrastive import contrastive_class_to_class_learned_memory
from ..losses.distill import kl_loss_compute1
from ..losses.feature_memory import (add_features_learned, elements_per_class,
                                     init_feature_memory, sample_class_rows)
from ..losses.topo import (_maybe_pool, dummy_topo_match,
                           topo_loss_from_match, topo_match_host,
                           topo_wasserstein)
from ..models.factory import get_dual_network_from_plans
from ..data.augment import augment_batch, downsample_seg_for_ds
from .trainer import MVDSegTrainer


def _backend_supports_callbacks() -> bool:
    """Whether jax.pure_callback works on the default backend. The topo loss
    runs persistence on the host through a callback; some remote-attached
    PJRT backends (e.g. tunneled TPUs) reject host send/recv."""
    try:
        out = jax.jit(lambda x: jax.pure_callback(
            lambda a: np.asarray(a) + 1.0,
            jax.ShapeDtypeStruct((), np.float32), x))(jnp.float32(1.0))
        return bool(np.isfinite(float(out)))
    except Exception:
        return False


@flax.struct.dataclass
class MVDTrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray
    memory: jnp.ndarray        # (C, M, F) feature memory bank
    memory_valid: jnp.ndarray  # (C, M)


class ContrastiveTrainer(MVDSegTrainer):
    """Dual-branch (T2+TOF) trainer with mutual distillation, topological
    constraint and class-wise contrastive memory."""

    # curriculum thresholds (reference :927,:957)
    memory_start_epoch = 50
    contrastive_start_epoch = 100

    def __init__(self, plans: dict, configuration: str, fold: int,
                 dataset_json: dict, unpack_data: bool = True,
                 device: str = "auto", specified_cfg: Optional[str] = None):
        super().__init__(plans, configuration, fold, dataset_json,
                         unpack_data, device, specified_cfg)
        self.lambda1 = 0.5
        self.lambda2 = 0.1
        self.lambda3 = 1.0
        self.num_epochs = 200
        # vessel channel compared by KL/topo (reference hardcodes index 2)
        self.vessel_class = min(2, self.label_manager.num_segmentation_heads - 1)
        self.topo_feat_d = 2
        # memory bank geometry (reference FeatureMemory(num_samples=60,
        # memory_per_class=256, n_classes=5); feature width = the net's
        # 16-dim projection space, which is what actually flows in)
        self.memory_per_class = 256
        self.memory_num_samples = 60
        self.feat_dim = 16
        # fixed caps replacing data-dependent gathers
        self.memory_candidates_per_class = 256
        self.contrastive_rows_per_class = 256
        self.contra_classes_branch2 = 2
        # pool factors applied to the vessel maps before cubical
        # persistence; None disables the topo term entirely
        self.topo_pool: Optional[tuple] = None  # set in initialize()
        # "avg" (default — round-5 on-chip 50-epoch A/B, documentation/
        # dice_parity.md: avg beat max on every metric, mean Dice
        # 0.9661 vs 0.9442, vessel 0.9447 vs 0.8979, Betti error 1.4 vs
        # 1.8). The round-4 "max keeps specks at full amplitude" theory
        # (mechanism pinned in tests/test_topology.py::test_max_pool_
        # probe_sees_single_voxel_specks) is refuted at training scale:
        # max pooling erases interior-void signal (a dark hole vanishes
        # under windowed max), the dim-2 term then under-constrains
        # voids, and its sparse argmax-routed gradients also slowed
        # vessel convergence. Override: MVDSEG_TOPO_POOL_MODE.
        self.topo_pool_mode = os.environ.get("MVDSEG_TOPO_POOL_MODE",
                                             "avg")
        # homology dimension the Wasserstein term compares; the reference
        # hardcodes 2 (voids — MVDTrainer.py:93 topo_feat_d), which is
        # structurally blind to the H0 speck components and H1 handles
        # the Betti-error metric counts. "all" compares all dims jointly
        # (losses/topo.py topo_dim=None). Override: MVDSEG_TOPO_FEAT_DIM.
        _td = os.environ.get("MVDSEG_TOPO_FEAT_DIM", "")
        if _td:
            self.topo_feat_d = None if _td == "all" else int(_td)
        self.enable_topo_loss = True
        self.topo_cap = 256
        # "auto" resolves at initialize(): "callback" (persistence through
        # jax.pure_callback inside the train jit) where the backend supports
        # host callbacks, else "two_phase" (device probe jit → host
        # persistence+matching → train jit taking the match as input) —
        # the design that runs the topological term on callback-less
        # backends like the axon-tunneled TPU. "off" disables the term.
        self.topo_mode = "auto"
        self.topo_q = 2.0
        # Pipeline the two-phase topological step: the probe jit for batch
        # k is enqueued BEFORE the train jit for batch k-1, so the host
        # persistence/matching of batch k runs while the device executes
        # train step k-1 (measured 0.2-0.4 s of host work hidden behind a
        # ~1 s device step). The match is thereby computed from params one
        # SGD step older than the params the loss differentiates — the
        # matching is a detached constant in the gradient either way (the
        # reference also treats it as such, MVDTrainer.py:904-924), and
        # with lr=0 the pipelined step is bit-identical to the sequential
        # one (tests/test_mvd_trainer.py). Disable to reproduce the exact
        # sequential schedule.
        self.topo_pipeline = True
        self._pending_step = None
        self._match_pool = None
        self._dummy_match_cache = {}

    def build_network_architecture(self, deep_supervision: bool = True):
        return get_dual_network_from_plans(
            self.plans_manager, self.dataset_json, self.configuration_manager,
            self.num_input_channels, deep_supervision=deep_supervision)

    def _ds_scales(self):
        """ContrastiveNet has 3 fixed deep-supervision heads at full, 1/2
        and 1/4 resolution (HybridNetwork.py:1493-1499,1565-1567)."""
        dim = len(self.configuration_manager.patch_size)
        return [(1.0,) * dim, (0.5,) * dim, (0.25,) * dim]

    # ------------------------------------------------------------------ setup

    #: total downsampling of the dual net's shared encoder
    #: (stem (2,2,2) x stages (2,2,2),(2,2,2),(2,4,4) — HybridNetwork.py:1676)
    ENCODER_DIVISOR = (16, 32, 32)

    def initialize(self):
        if self.was_initialized:
            return
        # ContrastiveNet's fixed encoder needs patch axes divisible by
        # (16, 32, 32); plans produced for PlainConvUNet pooling may not be.
        # Round up — the patch sampler pads cases smaller than the patch.
        patch = list(self.configuration_manager.patch_size)
        div = self.ENCODER_DIVISOR[-len(patch):]
        rounded = [int(-(-p // d) * d) for p, d in zip(patch, div)]
        if rounded != patch:
            self.print_to_log_file(
                f"patch {patch} -> {rounded} (dual-net encoder needs "
                f"multiples of {div})")
            self.configuration_manager.configuration["patch_size"] = rounded
            # persist into the plans dict too: the transformer encoder has
            # input-size-dependent parameters (pos embeds, EPA projections),
            # so the predictor must rebuild with the SAME patch from the
            # plans.json written to the model folder
            self.plans_manager.plans["configurations"].setdefault(
                self.configuration_name, {})["patch_size"] = rounded
        patch = tuple(rounded)
        if self.topo_pool is None:
            # pool each axis down to ≤target voxels for the per-step topo
            # term (default 32; MVDSEG_TOPO_POOL_TARGET overrides — the
            # granularity ablation knob: the reference pays full-res
            # persistence, MVDTrainer.py:904-924, so coarser pooling is a
            # documented approximation that needs measuring, not assuming)
            target = int(os.environ.get("MVDSEG_TOPO_POOL_TARGET", "32"))
            self.topo_pool = tuple(max(1, p // target) for p in patch)
        if not self.enable_topo_loss:
            self.topo_mode = "off"
        elif self.topo_mode == "auto":
            if _backend_supports_callbacks():
                self.topo_mode = "callback"
            else:
                self.topo_mode = "two_phase"
                self.print_to_log_file(
                    "This JAX backend does not support host callbacks "
                    "(pure_callback) — running the topological loss through "
                    "the two-phase step (device probe jit → host "
                    "persistence/matching → train jit).")
        super().initialize()

    def _init_state(self, params, extra_variables):
        n_classes = self.label_manager.num_segmentation_heads
        mem = init_feature_memory(n_classes, self.memory_per_class,
                                  self.feat_dim)
        return MVDTrainState(
            params=params,
            batch_stats=extra_variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            memory=mem.memory, memory_valid=mem.valid)

    # base-class initialize() hookpoints -------------------------------------

    def _init_network_state(self):
        patch = tuple(self.configuration_manager.patch_size)
        dummy = jnp.zeros((1, *patch, self.num_input_channels), jnp.bfloat16)
        variables = jax.jit(
            lambda r, x: self.network.init(r, x, train=False,
                                           method="init_all"))(
            self._next_rng(), dummy)
        return self._init_state(variables["params"], variables)

    # ------------------------------------------------------------- jit steps

    def _apply_heads(self, params, batch_stats, rows, branch):
        """projection→prediction on (C, K, F) rows with eval-mode BN."""
        variables = {"params": params, "batch_stats": batch_stats}
        flat = rows.reshape(-1, self.feat_dim)
        proj = self.network.apply(variables, flat, branch, train=False,
                                  method="project")
        pred = self.network.apply(variables, proj, branch, train=False,
                                  method="predict")
        C = rows.shape[0]
        return (proj.reshape(C, -1, self.feat_dim),
                pred.reshape(C, -1, self.feat_dim))

    def _class_selector_scores(self, params, batch_stats, rows, memory: bool):
        """Per-class selector score of each class's own rows: (C, K)."""
        variables = {"params": params, "batch_stats": batch_stats}
        C, K, F = rows.shape
        scores = self.network.apply(variables, rows.reshape(-1, F),
                                    memory=memory, train=False,
                                    method="selector_scores")  # (C, C*K, 1)
        scores = scores.reshape(C, C, K)
        return jax.vmap(lambda c: scores[c, c])(jnp.arange(C))

    def _memory_insert(self, state: MVDTrainState, key, out1, out2,
                       fea1, fea2, seg):
        """Insert high-confidence correctly-predicted voxels' projected
        features (both branches) into the memory (reference :927-955)."""
        n_classes = self.label_manager.num_segmentation_heads
        n_push = elements_per_class(self.configuration_manager.batch_size,
                                    self.memory_per_class,
                                    self.memory_num_samples)
        mem = state.memory
        val = state.memory_valid
        seg_flat = seg.reshape(-1)
        for branch, out, fea in ((1, out1, fea1), (2, out2, fea2)):
            prob = jax.nn.softmax(out[0].astype(jnp.float32), -1)
            conf = jnp.max(prob, -1)
            lab = jnp.argmax(prob, -1)
            correct = ((lab == seg) & (conf > 0.9)).reshape(-1)
            key, sub = jax.random.split(key)
            idx, mask = sample_class_rows(
                sub, seg_flat, correct, n_classes,
                self.memory_candidates_per_class)
            rows = jax.lax.stop_gradient(
                fea.reshape(-1, self.feat_dim)[idx].astype(jnp.float32))
            proj, _ = self._apply_heads(state.params, state.batch_stats,
                                        rows, branch)
            proj = jax.lax.stop_gradient(proj)
            scores = jax.lax.stop_gradient(self._class_selector_scores(
                state.params, state.batch_stats, proj, memory=False))
            from ..losses.feature_memory import FeatureMemoryState
            new = add_features_learned(
                FeatureMemoryState(memory=mem, valid=val),
                proj, mask, scores, n_push)
            mem, val = new.memory, new.valid
        return mem, val

    def _contrastive_term(self, params, batch_stats, memory, memory_valid,
                          key, fea1, fea2, seg):
        """λ2-weighted contrastive loss on all labeled voxels (:957-972)."""
        n_classes = self.label_manager.num_segmentation_heads
        seg_flat = seg.reshape(-1)
        eligible = jnp.ones_like(seg_flat, bool)  # labels != 6 ≡ all voxels
        total = 0.0
        for branch, fea, n_cls_loss in (
                (1, fea1, n_classes),
                (2, fea2, min(self.contra_classes_branch2, n_classes))):
            key, sub = jax.random.split(key)
            idx, mask = sample_class_rows(sub, seg_flat, eligible, n_classes,
                                          self.contrastive_rows_per_class)
            rows = fea.reshape(-1, self.feat_dim)[idx].astype(jnp.float32)
            _, pred = self._apply_heads(params, batch_stats, rows, branch)
            s_f = self._class_selector_scores(
                params, batch_stats, jax.lax.stop_gradient(pred),
                memory=False)
            s_m = self._class_selector_scores(
                params, batch_stats, memory, memory=True)
            # the reference's num_classes argument only truncates the
            # divisor/loop; mask classes ≥ n_cls_loss out of the sum
            cls_gate = (jnp.arange(n_classes) < n_cls_loss)[:, None]
            total = total + contrastive_class_to_class_learned_memory(
                pred, mask & cls_gate, memory, memory_valid, s_f, s_m,
                n_cls_loss)
        return total

    def _compile_steps(self):
        mesh = self.mesh
        batch_sharding = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        network = self.network
        tx = self.tx
        aug_cfg = self.aug_cfg
        vessel = self.vessel_class
        lam1, lam2, lam3 = self.lambda1, self.lambda2, self.lambda3

        def forward(params, batch_stats, key, data, train):
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                return network.apply(variables, data, train=True,
                                     rngs={"dropout": key},
                                     mutable=["batch_stats"])
            return network.apply(variables, data, train=False), None

        def vessel_prob(logits):
            # softmax + channel select in (b, c, voxels) layout: the
            # (..., C) softmax lane-pads C=5 to 128 on TPU
            b, c = logits.shape[0], logits.shape[-1]
            lg = jnp.swapaxes(logits.reshape(b, -1, c), 1, 2)
            logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=1)
            return jnp.exp(logp[:, vessel]).reshape(logits.shape[:-1])

        def pool_batch(x):
            return jax.vmap(lambda a: _maybe_pool(
                a, self.topo_pool, self.topo_pool_mode))(x)

        def train_step(state: MVDTrainState, key, epoch, data, seg,
                       topo_match):
            # batch contract: data (b, c, *patch) channels-first end to end
            # (loader → augmentation → model); the channels-last view fed
            # to the network cancels against its internal (B,C,*sp) entry
            # transpose inside this jit
            k_aug, k_drop, k_mem, k_con = jax.random.split(key, 4)
            if self.topo_mode != "two_phase":
                data, seg = augment_batch(k_aug, data, seg, aug_cfg,
                                          channels_first=True, mesh=mesh)
            # two_phase: the probe jit already augmented this batch (same
            # k_aug) and handed the augmented arrays back — they arrive
            # here as device-resident inputs, so augmentation runs ONCE
            # per step instead of twice (measured 591 ms at flagship scale)
            data = jnp.moveaxis(data, 1, -1)
            seg = jnp.maximum(seg, 0)
            targets = downsample_seg_for_ds(seg, self._ds_scales())

            def loss_fn(params):
                (out1, out2, fea1, fea2), mut = forward(
                    params, state.batch_stats, k_drop,
                    data.astype(jnp.bfloat16), True)
                l = self.loss(out1, targets) + self.loss(out2, targets)

                p1v = vessel_prob(out1[0])
                p2v = vessel_prob(out2[0])
                mutual = kl_loss_compute1(p1v, p2v)
                if self.topo_mode == "callback":
                    tgt_vessel = (seg == vessel).astype(jnp.float32)
                    topo = topo_wasserstein(
                        p1v, tgt_vessel, topo_dim=self.topo_feat_d,
                        q=self.topo_q, cap=self.topo_cap,
                        downsample=self.topo_pool,
                        pool_mode=self.topo_pool_mode)
                elif self.topo_mode == "two_phase":
                    topo = topo_loss_from_match(pool_batch(p1v), topo_match,
                                                q=self.topo_q)
                else:
                    topo = 0.0
                l = l + lam3 * topo + lam1 * mutual

                contra = jax.lax.cond(
                    epoch >= self.contrastive_start_epoch,
                    lambda: self._contrastive_term(
                        params, state.batch_stats, state.memory,
                        state.memory_valid, k_con, fea1, fea2, seg),
                    lambda: 0.0)
                l = l + lam2 * contra
                return l, (mut["batch_stats"], out1, out2, fea1, fea2,
                           mutual, topo, contra)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_bs, out1, out2, fea1, fea2, mutual, topo, contra = aux
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)

            mem, val = jax.lax.cond(
                epoch > self.memory_start_epoch,
                lambda: self._memory_insert(state, k_mem, out1, out2,
                                            fea1, fea2, seg),
                lambda: (state.memory, state.memory_valid))

            new_state = MVDTrainState(
                params=params, batch_stats=new_bs, opt_state=opt_state,
                step=state.step + 1, memory=mem, memory_valid=val)
            return new_state, {"loss": loss, "mutual": mutual,
                               "topo": topo, "contrastive": contra}

        def val_step(state: MVDTrainState, data, seg):
            seg = jnp.maximum(seg, 0)
            data = jnp.moveaxis(data, 1, -1)  # (b,c,*sp) batch contract
            (out1, out2, *_), _ = forward(state.params, state.batch_stats,
                                          None, data.astype(jnp.bfloat16),
                                          False)
            targets = downsample_seg_for_ds(seg, self._ds_scales())
            loss = self.loss(out1, targets) + self.loss(out2, targets)
            out = out1[0]
            # fg tp/fp/fn on flattened label maps ((..., C) one-hots
            # lane-pad C=5 to 128 on TPU)
            num_classes = out.shape[-1]
            b = out.shape[0]
            cls = jnp.argmax(out, -1).reshape(b, -1)
            sg = seg.reshape(b, -1)
            cidx = jnp.arange(1, num_classes).reshape(-1, 1, 1)
            predc = cls[None] == cidx
            tgtc = sg[None] == cidx
            return {"loss": loss,
                    "tp": jnp.sum(predc & tgtc, (1, 2)).astype(jnp.float32),
                    "fp": jnp.sum(predc & ~tgtc, (1, 2)).astype(jnp.float32),
                    "fn": jnp.sum(~predc & tgtc, (1, 2)).astype(jnp.float32)}

        def topo_probe(params, batch_stats, key, data, seg):
            """Device jit #1 of the two-phase topological step: run the
            step's augmentation (same rng split) + a branch-1-only forward
            (bitwise the logits loss_fn will differentiate — path-derived
            dropout rngs) and emit the POOLED vessel probability and GT
            maps for host persistence, PLUS the augmented batch so the
            train jit does not augment a second time. The augmented arrays
            never leave the device; only the small pooled maps do."""
            k_aug, k_drop, _, _ = jax.random.split(key, 4)
            data, seg = augment_batch(k_aug, data, seg, aug_cfg,
                                      channels_first=True, mesh=mesh)
            seg_nn = jnp.maximum(seg, 0)
            logits1, _ = network.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.moveaxis(data, 1, -1).astype(jnp.bfloat16), train=True,
                rngs={"dropout": k_drop}, mutable=["batch_stats"],
                method="forward_vessel1")
            p1v = vessel_prob(logits1)
            tgt = (seg_nn == vessel).astype(jnp.float32)
            return pool_batch(p1v), pool_batch(tgt), data, seg

        # 'model'-axis tensor parallelism (see parallel/mesh.py): the dual
        # net's large leaves (EPA projections, pos-embeds, decoder convs)
        # shard over the model axis; GSPMD inserts the collectives
        from ..parallel.mesh import tensor_parallel_shardings
        state_sh = tensor_parallel_shardings(self.state, mesh)
        self._train_step_fn = jax.jit(
            train_step,
            in_shardings=(state_sh, rep, rep, batch_sharding, batch_sharding,
                          rep),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,))
        self._topo_probe_fn = jax.jit(
            topo_probe,
            in_shardings=(state_sh.params, state_sh.batch_stats, rep,
                          batch_sharding, batch_sharding),
            out_shardings=(rep, rep, batch_sharding, batch_sharding))
        self._val_step_fn = jax.jit(
            val_step, in_shardings=(state_sh, batch_sharding, batch_sharding),
            out_shardings=rep)
        self._batch_sharding = batch_sharding

    # ------------------------------------------------------------- overrides

    def _topo_match_for_batch(self, key, data, seg):
        """Host phase of the two-phase step (or a zero dummy otherwise).
        Returns (match, data, seg) — in two-phase mode data/seg come back
        ALREADY AUGMENTED (device-resident outputs of the probe jit), so
        the train jit skips its augmentation."""
        batch = int(data.shape[0])
        if self.topo_mode != "two_phase":
            match = self._dummy_match_cache.get(batch)
            if match is None:
                match = dummy_topo_match(batch, self.topo_cap)
                self._dummy_match_cache[batch] = match
            return match, data, seg
        pooled_pred, pooled_tgt, aug_data, aug_seg = self._topo_probe_fn(
            self.state.params, self.state.batch_stats, key, data, seg)
        match = topo_match_host(np.asarray(pooled_pred),
                                np.asarray(pooled_tgt),
                                self.topo_feat_d, self.topo_q, self.topo_cap)
        return match, aug_data, aug_seg

    def train_step(self, data, seg):
        if self.topo_mode == "two_phase" and self.topo_pipeline:
            return self._train_step_pipelined(data, seg)
        key = self._next_rng()
        match, data, seg = self._topo_match_for_batch(key, data, seg)
        self.state, metrics = self._train_step_fn(
            self.state, key,
            jnp.asarray(self.current_epoch, jnp.int32), data, seg, match)
        return metrics

    # ------------------------------------------------- pipelined two-phase

    def _train_step_pipelined(self, data, seg):
        """One-deep pipelined two-phase step. Device queue per call:
        probe(batch k, params k-1) then train(batch k-1, params k-1) —
        both dispatched asynchronously, so the worker thread's pooled-map
        fetch + persistence/matching for batch k executes concurrently
        with the device's train step k-1. Returns the metrics of batch
        k-1, or None on the priming call (run_training drains the tail
        through flush_train_steps)."""
        if self._match_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._match_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="topo_match")
        key = self._next_rng()
        # at entry self.state still holds the pre-update params (the train
        # jit for the previous batch is dispatched below), so this probe
        # reads params one step stale — and runs first in the device queue
        pooled_pred, pooled_tgt, aug_data, aug_seg = self._topo_probe_fn(
            self.state.params, self.state.batch_stats, key, data, seg)
        if jax.default_backend() == "cpu":
            # XLA:CPU runs each n-partition program's collectives as n
            # rendezvous-ing threads from one shared pool; two programs in
            # flight (probe k + train k-1, or probe k+1 + train k) starve
            # each other's rendezvous and ABORT the process after a 40 s
            # timeout (seen on the forced 8-device host platform with 1
            # core — rendezvous.cc "only 2 of them arrived"). A real TPU's
            # per-device execution queue serializes programs, so only CPU
            # needs these barriers (here and in _run_pending); the
            # host-matching overlap below is kept either way.
            jax.block_until_ready(pooled_pred)
        fut = self._match_pool.submit(
            lambda p, t: topo_match_host(np.asarray(p), np.asarray(t),
                                         self.topo_feat_d, self.topo_q,
                                         self.topo_cap),
            pooled_pred, pooled_tgt)
        prev, self._pending_step = self._pending_step, {
            "key": key, "epoch": self.current_epoch, "fut": fut,
            "data": aug_data, "seg": aug_seg}
        return self._run_pending(prev) if prev is not None else None

    def _run_pending(self, p):
        self.state, metrics = self._train_step_fn(
            self.state, p["key"], jnp.asarray(p["epoch"], jnp.int32),
            p["data"], p["seg"], p["fut"].result())
        if jax.default_backend() == "cpu":
            # keep at most ONE multi-partition program in flight on CPU —
            # see the rendezvous-starvation note in _train_step_pipelined
            jax.block_until_ready(metrics["loss"])
        return metrics

    def flush_train_steps(self):
        if self._pending_step is None:
            return []
        p, self._pending_step = self._pending_step, None
        return [self._run_pending(p)]

    def save_checkpoint(self, filename: str):
        if not self.is_main_process():
            return
        state = jax.device_get(self.state)
        import pickle
        checkpoint = {
            "network_weights": flax.serialization.to_state_dict(state.params),
            "batch_stats": flax.serialization.to_state_dict(
                state.batch_stats),
            "opt_state": flax.serialization.to_state_dict(state.opt_state),
            "memory": np.asarray(state.memory),
            "memory_valid": np.asarray(state.memory_valid),
            "step": int(state.step),
            "logging": self.logger.get_checkpoint(),
            "_best_ema": self._best_ema,
            "current_epoch": self.current_epoch,
            "init_args": {"configuration": self.configuration_name,
                          "fold": self.fold},
            "trainer_name": self.__class__.__name__,
            "inference_allowed_mirroring_axes":
                self.inference_allowed_mirroring_axes,
        }
        with open(filename, "wb") as f:
            pickle.dump(checkpoint, f)

    def load_checkpoint(self, filename_or_checkpoint):
        import pickle
        if not self.was_initialized:
            self.initialize()
        ckpt = filename_or_checkpoint
        if isinstance(ckpt, str):
            with open(ckpt, "rb") as f:
                ckpt = pickle.load(f)
        params = flax.serialization.from_state_dict(
            self.state.params, ckpt["network_weights"])
        batch_stats = flax.serialization.from_state_dict(
            self.state.batch_stats, ckpt["batch_stats"])
        opt_state = flax.serialization.from_state_dict(
            self.state.opt_state, ckpt["opt_state"])
        self.state = MVDTrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=jnp.asarray(ckpt["step"], jnp.int32),
            memory=jnp.asarray(ckpt["memory"]),
            memory_valid=jnp.asarray(ckpt["memory_valid"]))
        self.logger.load_checkpoint(ckpt["logging"])
        self._best_ema = ckpt["_best_ema"]
        self.current_epoch = ckpt["current_epoch"]
        self.inference_allowed_mirroring_axes = \
            ckpt.get("inference_allowed_mirroring_axes")

    def perform_actual_validation(self, save_probabilities: bool = False):
        # the dual net needs batch_stats at inference — pass full variables
        self._validation_variables = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats)}
        return super().perform_actual_validation(save_probabilities)
