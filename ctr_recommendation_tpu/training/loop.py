"""Training driver: jitted sharded train/eval steps + epoch loop.

The TPU-native replacement for the reference's module-level script
(src/train_fibinet.py): same training semantics — weighted BCE, Adam +
OneCycle stepped per batch, global-norm clip 10, per-epoch AUC eval with
best-checkpoint selection on the monitored metric (train_fibinet.py:103-152)
— but structured as a class, jit-compiled over a device mesh (batch sharded
on ``data``, tables optionally row-sharded on ``model``), with donated train
state, on-device metrics, full-state resume, and step-time profiling.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ctr_recommendation_tpu.config.schema import ExperimentConfig
from ctr_recommendation_tpu.features.feature_map import build_feature_map
from ctr_recommendation_tpu.models.registry import get_model
from ctr_recommendation_tpu.parallel.mesh import make_mesh
from ctr_recommendation_tpu.parallel.sharding import param_specs
from ctr_recommendation_tpu.training import metrics as metrics_lib
from ctr_recommendation_tpu.training.checkpoint import CheckpointManager
from ctr_recommendation_tpu.training.optim import make_optimizer
from ctr_recommendation_tpu.training.train_state import TrainState


def bce_with_logits(logits, labels, weight=None):
    losses = optax.sigmoid_binary_cross_entropy(logits, labels.astype(jnp.float32))
    if weight is None:
        return jnp.mean(losses)
    w = weight.astype(jnp.float32)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


class Trainer:
    def __init__(
        self,
        experiment: ExperimentConfig,
        *,
        mesh=None,
        total_steps: int | None = None,
        steps_per_epoch: int | None = None,
        checkpoint_dir: str | None = None,
        lookup: Callable | None = None,
        item_store=None,
        log_fn: Callable[[str], None] = print,
    ):
        self.exp = experiment
        self.fm = build_feature_map(experiment.dataset)
        self.module = get_model(experiment.model.model)
        self.mesh = mesh if mesh is not None else make_mesh(experiment.mesh)
        # use_pallas survives multi-device meshes: the kernels carry a
        # custom_partitioning rule (batch-sharded x, replicated weights) so
        # GSPMD partitions them like any other op (ops/pallas/interaction.py)
        self.lookup = lookup
        self.log = log_fn
        self._compute_dtype = jnp.dtype(experiment.train.compute_dtype)

        tc = experiment.train
        if total_steps is None:
            spe = steps_per_epoch or 1000
            total_steps = spe * tc.epochs
        self.total_steps = total_steps
        from ctr_recommendation_tpu.training.sparse import make_table_optimizer

        sparse_tables = tc.table_optimizer != "dense"
        self.tx, self.schedule = make_optimizer(
            tc, total_steps, sparse_tables=sparse_tables
        )
        self.table_opt = make_table_optimizer(tc, self.schedule)
        if self.table_opt is not None and lookup is not None:
            raise ValueError(
                "table_optimizer != 'dense' replaces the embedding lookup with "
                "its deduplicated row gather; an injected sharded lookup cannot "
                "be combined with it (row exchange is left to GSPMD)"
            )
        if self.table_opt is not None:
            from ctr_recommendation_tpu.config.schema import FeatureType

            for f in self.fm.features:
                if f.type == FeatureType.SEQUENCE and f.pad_id != 0:
                    raise ValueError(
                        f"sparse table_optimizer requires pad_id 0 (feature "
                        f"{f.name!r} has pad_id {f.pad_id}): the batch id "
                        "remap preserves the pad mask only for id 0 "
                        "(training/sparse.py remap_batch)"
                    )

        self.ckpt = CheckpointManager(
            checkpoint_dir or tc.checkpoint_dir, max_to_keep=tc.keep_checkpoints,
            async_save=tc.async_checkpointing,
        )
        from ctr_recommendation_tpu.utils.tb import ScalarWriter

        import os as _os

        self._tb = ScalarWriter(
            _os.path.join(checkpoint_dir or tc.checkpoint_dir, "tb")
            if tc.tensorboard
            else None
        )
        # checkpoints are self-describing: persist the experiment so predict
        # can rebuild the exact model (config/serialize.py). Written here only
        # if absent — predict/evaluate construct Trainers with locally rewritten
        # paths and must not clobber the training run's provenance; fit /
        # fit_on_device refresh it at training start.
        import os as _os2

        self._experiment_json = _os2.path.join(
            checkpoint_dir or tc.checkpoint_dir, "experiment.json"
        )
        if not _os2.path.exists(self._experiment_json):
            self._save_experiment()

        da, ma = experiment.mesh.data_axis, experiment.mesh.model_axis
        self._batch_sharding = NamedSharding(self.mesh, P(da))
        self._repl_sharding = NamedSharding(self.mesh, P())

        # Device-resident item join: upload the item_info dense matrix once;
        # the per-batch join is a gather inside the jitted step (batches then
        # carry only ids — see data/device_store.py).
        from ctr_recommendation_tpu.data.device_store import (
            DeviceItemStore,
            dense_join_plan,
        )

        self._join_plan = dense_join_plan(self.fm)
        from ctr_recommendation_tpu.features.hashing import hash_plan

        # hash-trick features: ids hashed on device after the item join
        # (which indexes by raw id), before lookup / sparse remap
        self._hash_plan = hash_plan(self.fm)
        self._mm_tables: dict[str, jax.Array] = {}
        if item_store is not None:
            for dense_name, _ in self._join_plan:
                self._mm_tables[dense_name] = DeviceItemStore.from_host(
                    item_store, self._repl_sharding
                ).emb

        # --- init params on device with the right shardings ---
        key = jax.random.key(tc.seed)
        # local_devices: under multi-controller, devices()[0] may belong to
        # another process and init values would be unreadable here
        with jax.default_device(jax.local_devices()[0]):
            params, model_state = self.module.init(key, self.fm, experiment.model)
        pspecs = param_specs(params, self.mesh, ma)
        self._param_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), pspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
        # Sharding tree for the FULL train state: params by their specs,
        # optimizer moments like the params they mirror (so sharded tables
        # get sharded Adam state), scalars/stats replicated. Structures are
        # derived abstractly (eval_shape) so nothing is materialized twice.
        # The same sharding tree re-places arrays after checkpoint restore
        # (orbax hands back single-device arrays).
        from ctr_recommendation_tpu.parallel.sharding import opt_state_specs, put_global

        opt_shape = jax.eval_shape(self.tx.init, params)
        ospecs = opt_state_specs(opt_shape, pspecs, params)
        shard_tables = self.mesh.shape[ma] > 1
        if self.table_opt is not None:
            tshape = jax.eval_shape(self.table_opt.init, params["trunk"]["tables"])
        else:
            tshape = {}
        tspecs = jax.tree.map(
            lambda a: P(ma, None) if (shard_tables and a.ndim == 2) else P(),
            tshape,
        )
        spec_state = TrainState(
            step=P(),
            params=pspecs,
            model_state=jax.tree.map(lambda _: P(), model_state),
            opt_state=ospecs,
            table_opt_state=tspecs,
        )
        self._state_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s),
            spec_state,
            is_leaf=lambda x: isinstance(x, P),
        )
        # Host -> global placement: device_put single-process,
        # make_array_from_callback under multi-controller (where device_put
        # cannot target other processes' devices). Optimizer state is then
        # built INSIDE jit with out_shardings — eager zeros_like on global
        # arrays is not legal multi-controller.
        params = put_global(params, self._param_shardings)
        model_state = put_global(
            model_state, jax.tree.map(lambda _: self._repl_sharding, model_state)
        )

        @functools.partial(jax.jit, out_shardings=self._state_shardings)
        def _init_state(params, model_state):
            table_opt_state = (
                self.table_opt.init(params["trunk"]["tables"])
                if self.table_opt is not None
                else {}
            )
            return TrainState.create(params, model_state, self.tx, table_opt_state)

        self.state = _init_state(params, model_state)

        self._train_step_fn = self._build_train_step()
        self._train_chunk_fn = self._build_train_chunk()
        self._eval_step_fn = self._build_eval_step()
        self.history: list[dict[str, float]] = []
        self._epoch = 0

    # ------------------------------------------------------------------ steps
    def _device_join(self, feats: dict, mm_tables: dict) -> dict:
        from ctr_recommendation_tpu.data.device_store import device_join
        from ctr_recommendation_tpu.features.hashing import apply_hashing

        feats = device_join(feats, mm_tables, self._join_plan)
        return apply_hashing(feats, self._hash_plan)

    def _train_step(self, state, batch, rng):
        return self._train_step_fn(state, batch, self._mm_tables, rng)

    def _eval_step(self, params, model_state, batch):
        return self._eval_step_fn(params, model_state, self._mm_tables, batch)

    def _multi_feature_plan(
        self, feats: dict, only: list[str] | None = None
    ) -> dict[str, list[tuple[str, jax.Array]]]:
        """Tables read by >1 feature (item table: item_id + item_seq),
        with each feature's ids in the layout the trunk will request —
        sequences in the transposed (S, B) gather order. These route
        through sparse_lib.multi_feature_lookup: per-feature forward
        gathers (the fast layouts XLA already picks) whose custom_vjp
        backward emits ONE merged scatter-add per table instead of one per
        feature (round-4 roofline, docs/PERFORMANCE.md: split scatters
        815 + 300 us of the 2746 us step; merged measured 1082 us — the
        ~10 ns/row v5e dispatch floor would predict ~785 us, the gap is
        the unmerged moment updates; a flat-gather variant that merged
        the FORWARD too was measured 6x slower on the gather side and
        rejected). The raw
        id features are untouched (the trunk reads them as the pad mask);
        _merged_lookup matches callers to cached embeddings by ids.shape,
        so square (S == B) sequences — where the layouts are
        indistinguishable — keep the default per-feature path."""
        from ctr_recommendation_tpu.config.schema import FeatureType

        fm = self.fm
        multi: dict[str, list[tuple[str, jax.Array]]] = {}
        if not getattr(self, "_fuse_table_gather", True):
            return multi
        tables = set(only) if only is not None else {
            fm.table_of[f.name]
            for f in fm.features
            if f.type in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE)
        }
        for t in sorted(tables):
            fs = [
                f
                for f in fm.features
                if f.type in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE)
                and f.name in feats
                and fm.table_of[f.name] == t
            ]
            if len(fs) < 2 or any(
                f.type == FeatureType.SEQUENCE
                and feats[f.name].shape[0] == feats[f.name].shape[1]
                for f in fs
            ):
                continue
            # sequence layout follows the MODEL's lookup: mean pooling
            # gathers transposed (S, B) (see trunk.apply), but attention/
            # din pooling gathers (B, S) verbatim — planning the mean
            # layout there made _merged_lookup hand back a transposed
            # block that XLA relayouts per step (a full (S, B, E) copy)
            seq_transposed = getattr(
                self.module, "SEQ_POOLING", "mean"
            ) not in ("attention", "din")
            multi[t] = [
                (
                    f.name,
                    feats[f.name].astype(jnp.int32).T
                    if f.type == FeatureType.SEQUENCE and seq_transposed
                    else feats[f.name].astype(jnp.int32),
                )
                for f in fs
            ]
        return multi

    @staticmethod
    def _merged_lookup(tbls_in: dict, rows: dict, multi: dict):
        """The in-loss lookup closure: row buffers for gathered tables,
        merged-backward cached embeddings for _multi_feature_plan tables,
        plain per-feature gather otherwise."""
        from ctr_recommendation_tpu.training import sparse as sparse_lib

        emb_cache: dict[str, tuple[tuple, jax.Array]] = {}
        for t, segs in multi.items():
            outs = sparse_lib.multi_feature_lookup(
                tbls_in[t], *[ids for _, ids in segs]
            )
            for (fname, ids), o in zip(segs, outs):
                emb_cache[fname] = (tuple(ids.shape), o)

        def lookup(tbls, name, ids, feature=None, batch_dim=0):
            # gathered tables read the row buffer (grads flow to `rows`)
            if name in rows:
                return rows[name][ids]
            if feature in emb_cache:
                canon, o = emb_cache[feature]
                if tuple(ids.shape) == canon:
                    return o
                if ids.ndim == 2 and tuple(ids.shape) == canon[::-1]:
                    return o.transpose(1, 0, 2)
                # unexpected access pattern: fall back to the direct
                # per-feature gather (correct, just a second scatter)
            return tbls[name][ids]

        return lookup

    def _step_impl(self, state: TrainState, batch: dict, mm_tables: dict, rng):
        """One optimizer step (pure; shared by the per-batch jit and the
        on-device epoch scan)."""
        module, fm, cfg = self.module, self.fm, self.exp.model
        weight = batch.get("__weight__")
        labels = batch[fm.label]
        feats = {k: v for k, v in batch.items() if k not in (fm.label, "__weight__")}
        feats = self._device_join(feats, mm_tables)
        step_rng = jax.random.fold_in(rng, state.step)

        if self.table_opt is not None:
            return self._sparse_step_impl(state, feats, labels, weight, step_rng)

        # Merged-backward lookups apply to the dense path too (one
        # scatter-add per multi-feature table instead of one per feature —
        # see _multi_feature_plan), but never when a distributed lookup was
        # injected (parallel/embedding.py owns those gathers).
        multi = self._multi_feature_plan(feats) if self.lookup is None else {}

        def loss_fn(params):
            lookup = self.lookup
            if multi:
                lookup = self._merged_lookup(
                    params["trunk"]["tables"], {}, multi
                )
            logits, new_mstate = module.apply(
                params, state.model_state, fm, cfg, feats,
                train=True, rng=step_rng, compute_dtype=self._compute_dtype,
                lookup=lookup, weight=weight,
            )
            return bce_with_logits(logits, labels, weight), new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_mstate,
            opt_state=new_opt,
            table_opt_state=state.table_opt_state,
        )
        return new_state, {"loss": loss}

    def _sparse_step_impl(self, state: TrainState, feats, labels, weight, step_rng):
        """Sparse-table step (training/sparse.py): dedup the batch's ids per
        table, differentiate w.r.t. the GATHERED rows (the tables themselves
        receive zero grad via the row lookup), clip dense + row grads jointly
        (reference clips over all parameters, train_fibinet.py:119), then
        update dense params through the optax chain and only the touched
        table rows through the TableOptimizer."""
        from ctr_recommendation_tpu.training import sparse as sparse_lib

        from ctr_recommendation_tpu.config.schema import FeatureType

        module, fm, cfg = self.module, self.fm, self.exp.model
        tables = state.params["trunk"]["tables"]

        # Per-table execution strategy (static, from batch shapes): tables
        # much larger than the batch's id count take the gathered-rows path
        # (dedup + row buffer); the rest take masked-dense (full-table
        # elementwise, no sort/scatter) — identical lazy semantics.
        flat_counts: dict[str, int] = {}
        for f in fm.features:
            if f.type in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE) and (
                f.name in feats
            ):
                t = fm.table_of[f.name]
                flat_counts[t] = flat_counts.get(t, 1) + int(
                    np.prod(feats[f.name].shape)
                )
        # sorted (not a set): iteration order reaches the traced HLO via the
        # sub-dict constructions below, and per-process str-hash
        # randomization would otherwise change the persistent compilation
        # cache key on every run (measured: repeat full-scale runs recompiled
        # the 60s epoch scan each time)
        gathered = sorted(
            t
            for t, c in flat_counts.items()
            if sparse_lib.choose_strategy(tables[t].shape[0], c) == "gathered"
        )
        gathered_set = set(gathered)
        masked = [t for t in flat_counts if t not in gathered_set]

        # Rewrite gathered tables' id features to row-buffer indices once
        # (single unique/sort per table, no per-lookup searchsorted) —
        # pad-mask semantics are preserved because remap(0) == 0.
        feats, uids = sparse_lib.remap_batch(fm, feats, tables, only=gathered)
        rows = {n: sparse_lib.gather_rows(tables[n], uids[n]) for n in uids}
        # Masked-dense tables read the table param directly: grads flow to
        # params through XLA's gather-transpose scatter and drive
        # update_dense below. (A sorted-segment-sum backward via ONE
        # stream_gather per table was tried and measured SLOWER in context —
        # 825K vs 1.044M ex/s — the in-loop scatter is already well fused;
        # see docs/PERFORMANCE.md.)
        #
        # Masked tables shared by >1 feature (item table: item_id +
        # item_seq) route their lookups through the merged-backward plan
        # (see _multi_feature_plan); gathered tables keep the row-buffer
        # path.
        multi = self._multi_feature_plan(feats, only=masked)

        def loss_fn(params, rows):
            lookup = self._merged_lookup(
                params["trunk"]["tables"], rows, multi
            )
            logits, new_mstate = module.apply(
                params, state.model_state, fm, cfg, feats,
                train=True, rng=step_rng, compute_dtype=self._compute_dtype,
                lookup=lookup, weight=weight,
            )
            return bce_with_logits(logits, labels, weight), new_mstate

        (loss, new_mstate), (grads, row_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, rows)

        clip = self.exp.train.grad_clip_norm
        if clip and clip > 0:
            # joint global norm over dense grads (incl. masked tables' dense
            # table grads) + gathered row grads; gathered tables' direct
            # param grads are zero, so nothing is double-counted
            gnorm = optax.global_norm((grads, row_grads))
            scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-16))
            grads, row_grads = jax.tree.map(
                lambda g: g * scale, (grads, row_grads)
            )

        # dense chain updates everything except tables (multi_transform
        # zeroes every table's direct update, masked or gathered)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_tables = dict(tables)
        new_tstate = dict(state.table_opt_state)
        if gathered:
            sub = lambda d, keys: {k: d[k] for k in keys}
            upd_t, upd_s = self.table_opt.update(
                sub(tables, gathered), sub(state.table_opt_state, gathered),
                uids, row_grads, state.step,
            )
            new_tables.update(upd_t)
            new_tstate.update(upd_s)
        if masked:
            sub = lambda d, keys: {k: d[k] for k in keys}
            dense_grads = {t: grads["trunk"]["tables"][t] for t in masked}
            upd_t, upd_s = self.table_opt.update_dense(
                sub(tables, masked), sub(state.table_opt_state, masked),
                dense_grads, state.step,
            )
            new_tables.update(upd_t)
            new_tstate.update(upd_s)

        new_params = dict(new_params)
        new_params["trunk"] = dict(new_params["trunk"])
        new_params["trunk"]["tables"] = new_tables
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_mstate,
            opt_state=new_opt,
            table_opt_state=new_tstate,
        )
        return new_state, {"loss": loss}

    def _build_train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: dict, mm_tables: dict, rng: jax.Array):
            return self._step_impl(state, batch, mm_tables, rng)

        return train_step

    def _build_train_epoch(self, num_steps: int, batch_size: int):
        """Whole epoch as one jitted lax.scan over a device-resident split:
        per step, gather a shuffled batch from the on-device columns and run
        the optimizer step. Zero host involvement inside the epoch — this is
        the TPU-native answer to per-batch dispatch overhead."""

        da = self.exp.mesh.data_axis
        dp = self.mesh.shape[da]

        @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
        def train_epoch(
            state: TrainState, data: dict, perm: jax.Array, mm_tables: dict,
            rng: jax.Array,
        ):
            def body(carry, i):
                st = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
                batch = {k: v[idx] for k, v in data.items()}
                if dp > 1:
                    # distribute the gathered batch over the data axis so the
                    # step computes data-parallel even though the split
                    # itself is stored replicated
                    batch = {
                        k: jax.lax.with_sharding_constraint(
                            v,
                            NamedSharding(
                                self.mesh, P(da, *([None] * (v.ndim - 1)))
                            ),
                        )
                        for k, v in batch.items()
                    }
                st, metrics = self._step_impl(st, batch, mm_tables, rng)
                return st, metrics["loss"]

            state, losses = jax.lax.scan(
                body, state, jnp.arange(num_steps, dtype=jnp.int32)
            )
            return state, losses

        return train_epoch

    def _build_train_chunk(self):
        """K batches as ONE device program: a jitted lax.scan over a stacked
        (K, bs, ...) chunk. This is what closes the per-dispatch overhead gap
        on the host-driven paths (--stream / strict-items / multi-host):
        the round-2 measurement had the streaming path at 313K ex/s vs 1.36M
        on the epoch scan, entirely per-step dispatch-bound. jit retraces per
        distinct K (the tail chunk of an epoch compiles once)."""
        da = self.exp.mesh.data_axis
        dp = self.mesh.shape[da]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_chunk(state: TrainState, stacked: dict, mm_tables: dict,
                        rng: jax.Array):
            def body(st, batch):
                # undo the wire narrowing (put_chunk/_wire_dtype): uint8
                # label/weight -> f32, uint8/uint16 categoricals -> int32,
                # and 24-bit split ids (lo16 + hi8) recombined — free fused
                # casts on device, vs up to 4x the bytes through the relay
                wide = {}
                for k, v in batch.items():
                    if k.endswith("__hi8"):
                        continue  # consumed with its __lo16 partner
                    if k.endswith("__lo16"):
                        base = k[: -len("__lo16")]
                        hi = batch[base + "__hi8"]
                        wide[base] = v.astype(jnp.int32) | (
                            hi.astype(jnp.int32) << 16
                        )
                    elif v.dtype in (jnp.uint8, jnp.uint16):
                        wide[k] = v.astype(
                            jnp.float32
                            if k in (self.fm.label, "__weight__")
                            else jnp.int32
                        )
                    else:
                        wide[k] = v
                batch = wide
                if dp > 1:
                    batch = {
                        k: jax.lax.with_sharding_constraint(
                            v,
                            NamedSharding(
                                self.mesh, P(da, *([None] * (v.ndim - 1)))
                            ),
                        )
                        for k, v in batch.items()
                    }
                st, metrics = self._step_impl(st, batch, mm_tables, rng)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, stacked)

        return train_chunk

    def _wire_dtype(self, key: str, first: np.ndarray):
        """Narrowest safe wire encoding for a streamed column, decided ONCE
        on the first chunk (a per-chunk choice would retrace the jitted
        scan). Returns a numpy dtype, the string ``"split24"`` (ship as
        uint16 low half + uint8 high byte, 3 B/element), or None (int32/f32
        as-is).

        The streaming path is H2D-bandwidth-bound through this
        environment's relay (docs/PERFORMANCE.md round-3 decomposition:
        2.25 s compute + ~1.95 s serialized upload per 3.07M-row epoch), so
        every wire byte is wall-clock: binary labels/weights ride as uint8
        (4x), small-vocab categoricals (likes/views: vocab 11) as uint8,
        and id columns whose vocab fits 24 bits — item_id and item_seq at
        MicroLens scale (vocab 91718), the dominant 84 of ~94 wire
        bytes/row — as split24 (4 -> 3 B/element). The chunk scan body
        recombines/upcasts on device before the step, so training numerics
        are bit-identical (tests/test_chunked_fit.py)."""
        from ctr_recommendation_tpu.config.schema import FeatureType

        if key in (self.fm.label, "__weight__"):
            # only exactly-representable {0..255} integral values (CTR
            # labels and pad weights are 0/1); soft labels keep f32
            if first.dtype == np.float32 and np.all(
                first == first.astype(np.uint8)
            ):
                return np.dtype(np.uint8)
            return None
        for f in self.fm.features:
            if f.name != key or f.type not in (
                FeatureType.CATEGORICAL, FeatureType.SEQUENCE
            ):
                continue
            t = self.fm.table(self.fm.table_of[f.name])
            if t.hashed or first.min() < 0:
                # hashed ids are raw (possibly huge/negative) until the
                # on-device apply_hashing — never narrow them
                return None
            if t.vocab_size <= 1 << 8:
                return np.dtype(np.uint8)
            if t.vocab_size <= 1 << 16:
                return np.dtype(np.uint16)
            if t.vocab_size <= 1 << 24:
                return "split24"
        return None

    def put_chunk(self, buf: list[dict[str, np.ndarray]]) -> dict[str, jax.Array]:
        """Stack K same-shape numpy batches -> (K, bs, ...) device arrays,
        scan axis unsharded, rows sharded over the data axis. Columns ride
        the wire at their narrowest safe dtype (see _wire_dtype)."""
        from ctr_recommendation_tpu.config.schema import FeatureType

        dead = {
            f.name
            for f in self.fm.features
            if f.type == FeatureType.PLACEHOLDER  # zeros field; reads no column
        }
        stacked = {
            k: np.stack([b[k] for b in buf]) for k in buf[0] if k not in dead
        }
        if not hasattr(self, "_wire_plan"):
            self._wire_plan = {
                k: dt
                for k, v in stacked.items()
                if (dt := self._wire_dtype(k, v)) is not None
            }
        for k, dt in list(self._wire_plan.items()):
            v = stacked[k]
            if dt == "split24":
                if v.min() < 0 or (v >> 24).any():
                    # values outgrew the narrowing chosen from the first
                    # chunk: widen this column to pass-through for the rest
                    # of the stream instead of aborting the run. The wider
                    # wire signature retraces the chunk scan ONCE; numerics
                    # are unchanged (the device body upcasts either way).
                    self._wire_plan.pop(k)
                    self.log(
                        f"[stream] column {k!r} no longer fits the 24-bit "
                        "split wire encoding; widening to int32 for the "
                        "remaining chunks (one-time retrace)"
                    )
                    continue
                stacked[k + "__lo16"] = (v & 0xFFFF).astype(np.uint16)
                stacked[k + "__hi8"] = (v >> 16).astype(np.uint8)
                del stacked[k]
                continue
            w = v.astype(dt)
            if v.dtype != dt and not np.array_equal(w, v):
                # e.g. soft labels appearing mid-stream: ship this and all
                # later chunks at the original wide dtype (one retrace)
                self._wire_plan.pop(k)
                self.log(
                    f"[stream] column {k!r} no longer fits wire dtype "
                    f"{dt}; widening to {v.dtype} for the remaining "
                    "chunks (one-time retrace)"
                )
                continue
            stacked[k] = w
        from ctr_recommendation_tpu.parallel.distributed import host_local_to_global

        return host_local_to_global(
            stacked, self.mesh, self.exp.mesh.data_axis, batch_dim=1
        )

    @staticmethod
    def _chunked(batches: Iterator[dict], k: int) -> Iterator[list[dict]]:
        """Group consecutive same-structure batches into lists of up to k.
        A batch whose keys or shapes differ from the open chunk flushes it
        (stacking requires uniformity; iter_batches/stream_batches emit
        fixed shapes so this only triggers on exotic custom iterators)."""
        buf: list[dict] = []

        def sig(b):
            return tuple(sorted((key, v.shape, v.dtype) for key, v in b.items()))

        for b in batches:
            if buf and (len(buf) == k or sig(b) != sig(buf[0])):
                yield buf
                buf = []
            buf.append(b)
        if buf:
            yield buf

    def _build_eval_step(self):
        module, fm, cfg = self.module, self.fm, self.exp.model
        compute_dtype, lookup = self._compute_dtype, self.lookup

        @jax.jit
        def eval_step(params, model_state, mm_tables: dict, batch: dict):
            feats = {
                k: v for k, v in batch.items() if k not in (fm.label, "__weight__")
            }
            feats = self._device_join(feats, mm_tables)
            logits, _ = module.apply(
                params, model_state, fm, cfg, feats,
                train=False, compute_dtype=compute_dtype, lookup=lookup,
            )
            return jax.nn.sigmoid(logits)

        return eval_step

    # ------------------------------------------------------------------ data
    def put_batch(self, batch: dict[str, np.ndarray]) -> dict[str, jax.Array]:
        if jax.process_count() > 1:
            # multi-controller: each host contributes its local rows
            from ctr_recommendation_tpu.parallel.distributed import (
                host_local_to_global,
            )

            return host_local_to_global(
                dict(batch), self.mesh, self.exp.mesh.data_axis
            )
        return jax.device_put(batch, self._batch_sharding)

    def _replicated_key(self, seed: int):
        """Epoch rng, safe under multi-controller: device_put with a global
        replicated sharding is illegal there (non-addressable devices), but a
        host-side key passed into jit is lifted as replicated on every
        process — valid because all processes derive it from the same seed.

        The impl follows ``train.rng_impl``: "rbg" uses the TPU hardware
        bit-generator for dropout masks (-19% step time on dropout-heavy
        models, schema.py note); param init stays threefry regardless."""
        impl = {"threefry": "threefry2x32", "rbg": "rbg"}[self.exp.train.rng_impl]
        key = jax.random.key(seed, impl=impl)
        if jax.process_count() == 1:
            return jax.device_put(key, self._repl_sharding)
        return key

    def _save_experiment(self) -> None:
        try:
            from ctr_recommendation_tpu.config import serialize

            serialize.save(self.exp, self._experiment_json)
        except OSError:
            pass

    def _seed_history(self, start_epoch: int) -> None:
        """On resume, reload the persisted per-epoch rows (epoch <=
        start_epoch) so the rewritten metrics.csv keeps the pre-preemption
        epochs instead of erasing them."""
        import csv
        import os

        if self.history:
            return
        path = os.path.join(self.exp.train.checkpoint_dir, "metrics.csv")
        try:
            with open(path, newline="") as f:
                rows = list(csv.DictReader(f))
        except OSError:
            return
        for r in rows:
            parsed = {k: float(v) for k, v in r.items() if v not in (None, "")}
            if parsed.get("epoch", 0) <= start_epoch:
                self.history.append(parsed)

    def _seed_best(self, best: float) -> float:
        """On resume, continue the best-tracker from the persisted export's
        metric so a worse post-resume epoch cannot overwrite the best export."""
        persisted = self.ckpt.best_metric()
        if persisted is None:
            return best
        tc = self.exp.train
        better = max if tc.monitor_mode == "max" else min
        seeded = better(best, persisted)
        self.log(f"[resume] best {tc.monitor} so far: {persisted:.4f}")
        return seeded

    # ------------------------------------------------------------------ train
    def fit(
        self,
        train_batches: Callable[[int], Iterator[dict]],
        valid_batches: Callable[[], Iterator[dict]] | None = None,
        *,
        resume: bool = False,
    ) -> list[dict[str, float]]:
        """train_batches(epoch) -> iterator of numpy batch dicts."""
        tc = self.exp.train
        self._save_experiment()  # training owns the checkpoint's provenance
        rng = self._replicated_key(tc.seed + 1)
        best = -np.inf if tc.monitor_mode == "max" else np.inf
        start_epoch = 0

        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                restored = self.ckpt.restore(latest, self.state)
                self.state = jax.device_put(restored, self._state_shardings)
                start_epoch = int(latest)
                self.log(f"[resume] epoch {start_epoch} step {int(self.state.step)}")
            best = self._seed_best(best)
            self._seed_history(start_epoch)  # keeps metrics.csv complete

        from ctr_recommendation_tpu.data.prefetch import prefetch

        run_start = len(self.history)
        for epoch in range(start_epoch, tc.epochs):
            self._epoch = epoch
            t0 = time.time()
            n_steps, rows = 0, 0
            # Loss accumulates ON DEVICE: a per-step float(...) readback would
            # block the host on every step and serialize dispatch with
            # execution (measured ~10x slowdown vs the on-device epoch scan);
            # the only D2H reads are at log_every and epoch end.
            loss_sum = None
            k = max(1, tc.steps_per_dispatch)
            if k > 1:
                # K batches per dispatch, two pipeline stages: a decode
                # thread (parquet/columnar batch assembly) feeds a
                # stack+upload thread, while the main thread dispatches the
                # K-step scans — decode, H2D, and device compute all
                # overlap (single-stage left decode and upload serialized
                # behind each other at full scale: 678K vs ~1M ex/s).
                def _upload(buf):
                    stacked = self.put_chunk(buf)
                    # GLOBAL batch rows (under multi-controller each host's
                    # buf holds only its local shard of every batch)
                    bsz = next(iter(stacked.values())).shape[1]
                    return stacked, len(buf), bsz

                raw = prefetch(iter(train_batches(epoch)), depth=2 * k)
                chunks = prefetch(self._chunked(raw, k), transform=_upload)
                for stacked, n_chunk, bsz in chunks:
                    self.state, losses = self._train_chunk_fn(
                        self.state, stacked, self._mm_tables, rng
                    )
                    prev = n_steps
                    n_steps += n_chunk
                    rows += n_chunk * bsz
                    s = jnp.sum(losses)
                    loss_sum = s if loss_sum is None else loss_sum + s
                    if n_steps // tc.log_every > prev // tc.log_every:
                        loss_v = float(losses[-1])
                        lr = float(self.schedule(int(self.state.step) - 1))
                        self.log(
                            f"[epoch {epoch + 1}] step {n_steps} loss "
                            f"{loss_v:.4f} lr {lr:.6f}"
                        )
            else:
                batches = prefetch(
                    iter(train_batches(epoch)), transform=self.put_batch
                )
                for batch in batches:
                    bsz = len(next(iter(batch.values())))
                    self.state, m = self._train_step(self.state, batch, rng)
                    n_steps += 1
                    rows += bsz
                    loss_sum = (
                        m["loss"] if loss_sum is None else loss_sum + m["loss"]
                    )
                    if n_steps % tc.log_every == 0:
                        loss_v = float(m["loss"])
                        lr = float(self.schedule(int(self.state.step) - 1))
                        self.log(
                            f"[epoch {epoch + 1}] step {n_steps} loss "
                            f"{loss_v:.4f} lr {lr:.6f}"
                        )
            # one honest D2H value read closes the epoch (and the timer)
            train_loss = float(loss_sum) / n_steps if n_steps else 0.0
            dt = time.time() - t0
            entry: dict[str, float] = {
                "epoch": epoch + 1,
                "train_loss": train_loss,
                "examples_per_sec": rows / dt if dt > 0 else 0.0,
                "seconds": dt,
            }

            if valid_batches is not None:
                entry.update(self.evaluate(valid_batches()))
                metric = entry[tc.monitor]
                improved = (
                    metric > best if tc.monitor_mode == "max" else metric < best
                )
                if improved:
                    best = metric
                    self.ckpt.save_best(
                        self.state.params, self.state.model_state, metric,
                        int(self.state.step),
                    )
                    self.log(
                        f"[epoch {epoch + 1}] new best {tc.monitor}={metric:.4f} — exported"
                    )
            # Full-state resume point every checkpoint_every epochs (and
            # always at the end) regardless of save_best_only — closes the
            # preemption-recovery gap the reference has (SURVEY §5.3); the
            # best-metric EXPORT above is still gated on improvement.
            if (epoch + 1) % tc.checkpoint_every == 0 or epoch + 1 == tc.epochs:
                self.ckpt.save(epoch + 1, self.state)
            self.log(
                f"[epoch {epoch + 1}] loss {train_loss:.4f} "
                + " ".join(
                    f"{k} {v:.4f}" for k, v in entry.items()
                    if k in ("auc", "logloss")
                )
                + f" ({rows}/{dt:.1f}s = {entry['examples_per_sec']:.0f} ex/s)"
            )
            self.history.append(entry)
            self._write_history_csv()
        self.ckpt.wait()  # final async resume-point durably on disk
        self.log(f"Done. Best {tc.monitor}: {best:.4f}")
        return self.history[run_start:]

    def _write_history_csv(self) -> None:
        """Structured metric log (SURVEY §5.5: the reference only prints;
        its declared logs_root is dead). One CSV row per epoch, mirrored to
        TensorBoard when the package is available."""
        import csv
        import os

        if self.history:
            last = self.history[-1]
            self._tb.scalars(int(last.get("epoch", len(self.history))), last)

        path = os.path.join(self.exp.train.checkpoint_dir, "metrics.csv")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        keys: list[str] = []
        for h in self.history:
            for k in h:
                if k not in keys:
                    keys.append(k)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.history)

    # -------------------------------------------------------- device-resident
    def _upload_split(self, table, include_label: bool = True) -> dict:
        from ctr_recommendation_tpu.parallel.sharding import put_global

        cols = {
            k: put_global(v, self._repl_sharding)
            for k, v in table.columns.items()
            if include_label or k != self.fm.label
        }
        return cols

    def profile_epoch(self, train, log_dir: str) -> None:
        """Capture a jax.profiler device trace of one on-device epoch
        (Perfetto/XProf-compatible, SURVEY §5.1 gap)."""
        from ctr_recommendation_tpu.utils.profiling import trace

        tc = self.exp.train
        steps = max(train.num_rows // tc.batch_size, 1)
        data = self._upload_split(train)
        epoch_fn = self._build_train_epoch(steps, tc.batch_size)
        perm = jax.random.permutation(jax.random.key(0), train.num_rows)
        rng = jax.random.key(1)
        # compile outside the trace so the capture is pure execution
        self.state, losses = epoch_fn(self.state, data, perm, self._mm_tables, rng)
        jax.block_until_ready(losses)
        with trace(log_dir):
            self.state, losses = epoch_fn(self.state, data, perm, self._mm_tables, rng)
            jax.block_until_ready(losses)
        self.log(f"[profile] trace written to {log_dir}")

    def fit_on_device(self, train, valid=None, *, resume: bool = False):
        """Train with the whole split resident in HBM: one jitted lax.scan
        per epoch (see _build_train_epoch). Semantically identical to
        ``fit`` with drop_last shuffled batches; host involvement per epoch
        is one permutation upload + one scalar readback.

        ``train``/``valid`` are TableData (data/parquet.py). Dense item
        features come from the device-side join, so the split carries ids
        only.
        """
        tc = self.exp.train
        self._save_experiment()  # training owns the checkpoint's provenance
        bs = tc.batch_size
        n = train.num_rows
        steps = n // bs
        if steps == 0:
            raise ValueError(f"batch_size {bs} > split rows {n}")
        data = self._upload_split(train)
        epoch_fn = self._build_train_epoch(steps, bs)
        valid_data = None
        if valid is not None:
            valid_data = self._prepare_eval_split(valid, tc.eval_batch_size)

        rng = self._replicated_key(tc.seed + 1)
        perm_key = jax.random.key(tc.seed + 2)
        best = -np.inf if tc.monitor_mode == "max" else np.inf
        start_epoch = 0
        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                restored = self.ckpt.restore(latest, self.state)
                self.state = jax.device_put(restored, self._state_shardings)
                start_epoch = int(latest)
                self.log(f"[resume] epoch {start_epoch} step {int(self.state.step)}")
            best = self._seed_best(best)
            self._seed_history(start_epoch)  # keeps metrics.csv complete

        run_start = len(self.history)
        for epoch in range(start_epoch, tc.epochs):
            t0 = time.time()
            if tc.shuffle:
                perm = jax.random.permutation(jax.random.fold_in(perm_key, epoch), n)
            else:
                perm = jnp.arange(n)
            self.state, losses = epoch_fn(self.state, data, perm, self._mm_tables, rng)
            train_loss = float(jnp.mean(losses))
            if not np.isfinite(train_loss):
                raise FloatingPointError(
                    f"non-finite train loss at epoch {epoch + 1}: {train_loss} "
                    "(enable jax_debug_nans to localize)"
                )
            dt = time.time() - t0
            rows = steps * bs
            entry: dict[str, float] = {
                "epoch": epoch + 1,
                "train_loss": train_loss,
                "examples_per_sec": rows / dt if dt > 0 else 0.0,
                "seconds": dt,
            }
            if valid_data is not None:
                t_eval = time.time()
                entry.update(self._evaluate_prepared(valid_data))
                entry["eval_seconds"] = time.time() - t_eval
                metric = entry[tc.monitor]
                improved = metric > best if tc.monitor_mode == "max" else metric < best
                if improved:
                    best = metric
                    self.ckpt.save_best(
                        self.state.params, self.state.model_state, metric,
                        int(self.state.step),
                    )
                    self.log(
                        f"[epoch {epoch + 1}] new best {tc.monitor}={metric:.4f} — exported"
                    )
            t_save = time.time()
            if (epoch + 1) % tc.checkpoint_every == 0 or epoch + 1 == tc.epochs:
                self.ckpt.save(epoch + 1, self.state)
                entry["checkpoint_seconds"] = time.time() - t_save
            else:
                # keep every history row's schema identical — DictWriter
                # would otherwise emit blank cells on skipped epochs
                entry["checkpoint_seconds"] = 0.0
            self.log(
                f"[epoch {epoch + 1}] loss {train_loss:.4f} "
                + " ".join(
                    f"{k} {v:.4f}" for k, v in entry.items() if k in ("auc", "logloss")
                )
                + f" ({rows}/{dt:.2f}s = {entry['examples_per_sec']:.0f} ex/s)"
            )
            self.history.append(entry)
            self._write_history_csv()
        self.ckpt.wait()  # final async resume-point durably on disk
        self.log(f"Done. Best {tc.monitor}: {best:.4f}")
        return self.history[run_start:]

    def _prepare_eval_split(self, table, batch_size: int):
        """Pad to a batch multiple, upload once, build the jitted eval scan."""
        n = table.num_rows
        num_batches = max(1, -(-n // batch_size))
        padded = num_batches * batch_size
        cols = {}
        for k, v in table.columns.items():
            pad = padded - n
            if pad:
                v = np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
            cols[k] = jax.device_put(v, self._repl_sharding)
        weight = np.concatenate(
            [np.ones(n, np.float32), np.zeros(padded - n, np.float32)]
        )
        weight = jax.device_put(weight, self._repl_sharding)

        module, fm, cfg = self.module, self.fm, self.exp.model
        compute_dtype = self._compute_dtype

        @jax.jit
        def eval_scan(params, model_state, data, mm_tables):
            def body(_, i):
                start = i * batch_size
                batch = {
                    k: jax.lax.dynamic_slice_in_dim(v, start, batch_size)
                    for k, v in data.items()
                }
                feats = {k: v for k, v in batch.items() if k != fm.label}
                feats = self._device_join(feats, mm_tables)
                logits, _ = module.apply(
                    params, model_state, fm, cfg, feats,
                    train=False, compute_dtype=compute_dtype, lookup=self.lookup,
                )
                return None, jax.nn.sigmoid(logits)

            _, probs = jax.lax.scan(
                body, None, jnp.arange(num_batches, dtype=jnp.int32)
            )
            return probs.reshape(-1)

        labels = cols[fm.label]
        feats_only = {k: v for k, v in cols.items() if k != fm.label}
        return {"fn": eval_scan, "data": feats_only, "labels": labels, "weight": weight}

    def _metrics_from(self, labels, probs, weight) -> dict[str, float]:
        """AUC (exact sort-based, or histogram-binned when
        ``num_eval_threshold_bins`` is set) + logloss, all on device."""
        nbins = self.exp.train.num_eval_threshold_bins
        if nbins:
            hp = jnp.zeros((nbins,))
            hn = jnp.zeros((nbins,))
            hp, hn = metrics_lib.binned_auc_update(
                hp, hn, labels, probs, weight, num_bins=nbins
            )
            auc_v = metrics_lib.binned_auc_finalize(hp, hn)
        else:
            auc_v = metrics_lib.auc(labels, probs, weight)
        ll = metrics_lib.logloss(labels, probs, weight)
        return {"auc": float(auc_v), "logloss": float(ll)}

    def _evaluate_prepared(self, prepared) -> dict[str, float]:
        probs = prepared["fn"](
            self.state.params, self.state.model_state, prepared["data"],
            self._mm_tables,
        )
        return self._metrics_from(prepared["labels"], probs, prepared["weight"])

    def evaluate_table(self, table, batch_size: int | None = None) -> dict[str, float]:
        """AUC/logloss over a TableData split, fully on device."""
        prepared = self._prepare_eval_split(
            table, batch_size or self.exp.train.eval_batch_size
        )
        return self._evaluate_prepared(prepared)

    # ------------------------------------------------------------------ eval
    def evaluate(self, batches: Iterator[dict]) -> dict[str, float]:
        """AUC/logloss over an iterator of batches.

        With ``num_eval_threshold_bins`` set, metrics accumulate PER BATCH
        (binned-AUC histograms + weighted logloss sums) — constant memory
        at any split size, the streaming-eval companion of
        data/streaming.py (a valid split larger than the stream buffer
        never materializes its prediction vector). With bins unset the
        exact sort-based AUC needs every (prob, label) pair, so the
        vectors concatenate as before — at production-log scale set bins
        (4096 bins are within ~1e-4 of exact on MicroLens-sized splits,
        tests/test_metrics.py)."""
        nbins = self.exp.train.num_eval_threshold_bins
        if not nbins:
            probs_l, labels_l, w_l = [], [], []
            for batch in batches:
                b = self.put_batch(batch)
                probs = self._eval_step(
                    self.state.params, self.state.model_state, b
                )
                probs_l.append(probs)
                labels_l.append(b[self.fm.label])
                w_l.append(b.get("__weight__", jnp.ones_like(probs)))
            probs = jnp.concatenate(probs_l)
            labels = jnp.concatenate(labels_l)
            weight = jnp.concatenate(w_l)
            return self._metrics_from(labels, probs, weight)

        hp = jnp.zeros((nbins,))
        hn = jnp.zeros((nbins,))
        ll_sum = jnp.zeros(())
        w_sum = jnp.zeros(())
        for batch in batches:
            b = self.put_batch(batch)
            probs = self._eval_step(self.state.params, self.state.model_state, b)
            labels = b[self.fm.label]
            weight = b.get("__weight__", jnp.ones_like(probs))
            hp, hn = metrics_lib.binned_auc_update(
                hp, hn, labels, probs, weight, num_bins=nbins
            )
            bw = jnp.sum(weight)
            # logloss() divides by max(sum(w), 1) — undo with the SAME
            # clamp so a batch with fractional total weight contributes
            # its true weighted-loss mass
            ll_sum = ll_sum + metrics_lib.logloss(labels, probs, weight) * (
                jnp.maximum(bw, 1.0)
            )
            w_sum = w_sum + bw
        auc_v = metrics_lib.binned_auc_finalize(hp, hn)
        ll = ll_sum / jnp.maximum(w_sum, 1.0)
        return {"auc": float(auc_v), "logloss": float(ll)}

    # ------------------------------------------------------------------ infer
    def predict(self, batches: Iterator[dict]) -> np.ndarray:
        out = []
        for batch in batches:
            b = self.put_batch(batch)
            probs = self._eval_step(self.state.params, self.state.model_state, b)
            w = np.asarray(batch.get("__weight__", np.ones(len(probs))))
            p = np.asarray(probs)
            out.append(p[w > 0])
        return np.concatenate(out)

    def load_best(self) -> None:
        params, mstate = self.ckpt.restore_best(
            self.state.params, self.state.model_state
        )
        self.state = self.state._replace(params=params, model_state=mstate)
