"""Bulk polishing driver — the polish_seqs equivalent.

The full per-batch chain of the reference
(reference: scripts/goldpolish:446-583 + goldpolish-polish-batch:70-100 +
goldpolish-make:62-72):

    batch.fa -> [multi-k ntEdit, X=Y=0.5, -m1 -a1]
             -> [goldpolish-mask -s -k<first k>]
             -> [sealer -L<first k> -P10 -B1000 --lower]
             -> [to-upper]

run in-process: per batch, mapped reads are pulled through the SeqIndex,
filled into per-batch multi-k Bloom filters (native host loop), and the
chain executes with the TPU two-phase editor and the Konnector gap filler.
Batches run concurrently under an asyncio pool with a strictly ordered
writer and a checkpoint manifest (pipeline.engine).
"""

from __future__ import annotations

import asyncio
import os
from dataclasses import dataclass

from ..bf_builder import BFBuilder
from ..config import PipelineConfig
from ..fill import sealer as sealer_mod
from ..io import fasta, seqindex
from ..mappings import AllMappings
from ..polish import mask as mask_mod
from ..polish import multik
from ..utils.log import get_logger
from . import engine

log = get_logger("bulk")


def build_indexes(cfg: PipelineConfig, workspace: str):
    """Build (or load cached) SeqIndexes (reference goldpolish-make:50-51).

    The TSV cache lives NEXT TO the input (`<input>.index`, the reference's
    `%.index` make target) so it survives the run and a rerun/resume skips
    the linear scan; an unwritable input directory falls back to the
    run-scoped workspace."""

    def index_for(path: str) -> seqindex.SeqIndex:
        for cache in (
            path + ".index",
            os.path.join(workspace, os.path.basename(path) + ".index"),
        ):
            if os.path.exists(cache) and (
                os.path.getmtime(cache) >= os.path.getmtime(path)
            ):
                return seqindex.SeqIndex.load(cache, path)
        idx = seqindex.SeqIndex.build(path)
        for cache in (
            path + ".index",
            os.path.join(workspace, os.path.basename(path) + ".index"),
        ):
            try:
                idx.save(cache)
                break
            except OSError:
                continue
        return idx

    return index_for(cfg.seqs_to_polish), index_for(cfg.polishing_seqs)


def resolve_mappings(cfg: PipelineConfig, target_index,
                     workdir: str = ".") -> AllMappings:
    """Load provided mappings or produce them.

    Mapper preference: an explicit --mappings file; else the configured
    external mapper when on PATH (the reference shells out to
    ntLink/minimap2, scripts/goldpolish:204-295); else the framework's own
    minimizer mapper (self-contained, ntLink-TSV-compatible output so the
    adaptive filter applies unchanged).

    Mapping artifacts land in the CWD (like the reference's make targets)
    and are REUSED when newer than both inputs — the make DAG's timestamp
    resumability (goldpolish-make:45 .SECONDARY), restored here for every
    mapper path."""
    import shutil
    import subprocess

    def fresh(artifact: str) -> bool:
        if not os.path.exists(artifact):
            return False
        m = os.path.getmtime(artifact)
        if m < os.path.getmtime(cfg.seqs_to_polish) or m < os.path.getmtime(
            cfg.polishing_seqs
        ):
            return False
        log.info("reusing up-to-date mappings %s", artifact)
        return True

    path = cfg.mappings_path
    if not path and cfg.mapper == "minimap2" and shutil.which("minimap2"):
        path = (
            f"{os.path.basename(cfg.seqs_to_polish)}."
            f"{os.path.basename(cfg.polishing_seqs)}.paf"
        )
        if not fresh(path):
            with open(path, "w") as out:
                subprocess.run(
                    ["minimap2", f"-t{cfg.threads}", cfg.seqs_to_polish,
                     cfg.polishing_seqs],
                    stdout=out, check=True,
                )
    elif not path and cfg.mapper == "ntlink" and shutil.which("ntLink"):
        path = (
            f"{os.path.basename(cfg.seqs_to_polish)}"
            f".k{cfg.k_ntlink}.w{cfg.w_ntlink}.z1000.mapping.tsv"
        )
        if not fresh(path):
            subprocess.run(
                ["ntLink", f"t={cfg.threads}", f"target={cfg.seqs_to_polish}",
                 f"reads={cfg.polishing_seqs}", "pair", "verbose=True",
                 f"k={cfg.k_ntlink}", f"w={cfg.w_ntlink}", "sensitive=True"],
                check=True,
            )
    elif not path:
        from .. import mapper as internal_mapper

        if cfg.mapper != "internal":
            log.warning(
                "mapper '%s' not on PATH; using the internal minimizer mapper",
                cfg.mapper,
            )
        path = (
            f"{os.path.basename(cfg.seqs_to_polish)}"
            f".{os.path.basename(cfg.polishing_seqs)}.internal.mapping.tsv"
        )
        if not fresh(path):
            # tmp next to the destination: the workspace is usually /dev/shm
            # while the artifact lands in the CWD, and rename(2) across
            # filesystems raises EXDEV
            tmp = path + ".tmp"
            internal_mapper.write_mapping_tsv(
                cfg.seqs_to_polish, cfg.polishing_seqs, tmp
            )
            os.replace(tmp, path)
    return AllMappings.load(
        path, target_index,
        mx_max_mapped_seqs_per_target_10kbp=cfg.mx_max_reads_per_10kbp,
    )


@dataclass
class BatchResult:
    records: list
    stats: dict


# --- fork-based process pool ------------------------------------------------
# The asyncio thread pool is GIL-bound for the Python stages (~1.2 cores);
# a fork pool inherits the builder/config by copy-on-write (no pickling) and
# scales the per-batch chain across host cores — the in-process analogue of
# the reference's 200 worker processes (scripts/goldpolish:43).  Only valid
# with the host backends (forked children must not touch the jax runtime).
_POOL_STATE: dict = {}


def _pool_worker(records):
    return polish_batch_records(
        records, _POOL_STATE["builder"], _POOL_STATE["cfg"]
    )


def build_batch_bfs(builder: BFBuilder, cfg: PipelineConfig, ids: list[str]):
    """Per-batch filter build, host or fast-mode device (superset filter,
    documented deviation; in-process only — fork-pool workers never run the
    jax backend)."""
    if cfg.device_bf_build and cfg.backend == "jax":
        return builder.build_batch_device(ids)
    return builder.build_batch(ids)


def polish_batch_records(records, builder: BFBuilder, cfg: PipelineConfig,
                         batch_bfs=None) -> BatchResult:
    """One batch through the full chain (ntedit -> mask -> sealer -> upper).

    batch_bfs: prefilled filters from the lookahead fill thread (the
    reference's BF-builder-server concurrency, goldpolish_targeted_bfs.cpp
    :177-238 — batch N+1's filters build while batch N polishes); None
    builds inline.

    Per-stage wall times land in stats["timing"] — the in-process
    equivalent of the reference's opt-in GNU-time rule wrapping
    (reference: goldpolish-make:36-41, smk --benchmark)."""
    import time as _time

    ids = [h.split()[0] for h, _ in records]
    timing: dict = {}
    t0 = _time.monotonic()
    if batch_bfs is None:
        batch_bfs = build_batch_bfs(builder, cfg, ids)
    timing["bf_build_s"] = round(_time.monotonic() - t0, 3)
    stats: dict = {"timing": timing}
    # 1. multi-k ntEdit with rollback guard
    t0 = _time.monotonic()
    edited, mk_stats = multik.polish_multik(
        records, batch_bfs, k_values=cfg.k_values,
        x=cfg.ntedit_x, y=cfg.ntedit_y, backend=cfg.backend,
    )
    timing["ntedit_s"] = round(_time.monotonic() - t0, 3)
    stats["ntedit"] = mk_stats
    if cfg.run_sealer:
        # 2. mask short runs (soft, k = first k)
        prepped = [
            (h, mask_mod.mask_short_runs(s, cfg.k_values[0], soft=True))
            for h, s in edited
        ]
        # 3. sealer gap fill
        scfg = sealer_mod.SealerConfig(
            k_values=cfg.k_values,
            flank_length=cfg.k_values[0],
            max_gap_length=cfg.sealer_max_gap_length,
            max_paths=cfg.sealer_max_paths,
            max_branches=cfg.sealer_max_branches,
            max_cost=cfg.sealer_max_cost,
            verbose=cfg.verbose,
        )
        bfs_by_k = {k: batch_bfs.bf_for_k(k) for k in cfg.k_values}
        t0 = _time.monotonic()
        sealed, seal_stats = sealer_mod.seal_records(
            prepped, bfs_by_k, scfg,
            # device-batched BFS probes on the jax backend (in-process
            # only: fork-pool workers run host backends by construction)
            backend="jax" if cfg.backend == "jax" else "numpy",
        )
        timing["sealer_s"] = round(_time.monotonic() - t0, 3)
        stats["sealer"] = seal_stats
    else:
        sealed = edited
    # 4. uppercase
    final = [(h, mask_mod.to_upper(s)) for h, s in sealed]
    return BatchResult(records=final, stats=stats)


def run_bulk(cfg: PipelineConfig) -> dict:
    """Polish cfg.seqs_to_polish with cfg.polishing_seqs -> cfg.output_seqs.

    Returns aggregate stats.  Output record order always equals input order
    (ordered-writer / reaper contract).
    """
    import time as _time

    # static config error, not a per-batch condition: fail at startup with
    # a clear message instead of per-batch fallback-warning spam (the
    # device build packs k-mers against a KHALO-base row halo)
    if (cfg.device_bf_build or cfg.fill_overlap) and any(
        k > 33 for k in cfg.k_values
    ):
        raise ValueError(
            f"device BF build supports k <= 33; got {cfg.k_values} — "
            "disable device_bf_build/fill_overlap or drop the larger k"
        )

    t_start = _time.monotonic()
    ws = engine.Workspace(
        prefix=f"goldpolish-tpu-{os.getpid()}",
        base=cfg.workspace or None,
        signal_safe=True,
    )
    try:
        target_index, reads_index = build_indexes(cfg, ws.dir)
        all_mappings = resolve_mappings(cfg, target_index, ws.dir)
        builder = BFBuilder(
            target_index, reads_index, all_mappings, cfg.k_values,
            hash_num=cfg.hash_num, cbf_bytes=cfg.cbf_bytes,
            bf_bytes=cfg.bf_bytes,
            subsample_max_mapped_seqs_per_target_10kbp=cfg.resolved_subsample(),
        )
        records = ((r.name, r.seq) for r in fasta.read_seqs(cfg.seqs_to_polish))
        all_batches = list(engine.make_batches(records, cfg.batch_size))
        manifest = engine.CheckpointManifest(cfg.checkpoint or None)
        # resume data plane: with a checkpoint configured, every finished
        # batch's output is ALSO published as an atomically-renamed FASTA
        # next to the manifest BEFORE the batch is marked done, so a
        # preempted run replays completed batches from disk instead of
        # re-polishing (restores — and beats — the reference's make-level
        # resumability, goldpolish-make:45 .SECONDARY)
        ckpt_dir = (cfg.checkpoint + ".batches") if cfg.checkpoint else None
        if ckpt_dir:
            os.makedirs(ckpt_dir, exist_ok=True)
        totals = {"batches": len(all_batches), "contigs": 0, "bases_out": 0,
                  "resumed_batches": 0}
        t_setup = _time.monotonic() - t_start  # index + mapping + builder
        timing_sum: dict = {}

        # multi-host: each host polishes its share of batches, publishing
        # per-batch files; host 0 runs the ordered reaper (parallel.distributed)
        from ..parallel import distributed as dist

        host_id, n_hosts = dist.init_distributed()
        my_batches = [
            b for b in all_batches
            if dist.host_owns_batch(b.index, host_id, n_hosts)
        ]

        loop = asyncio.new_event_loop()

        executor = None
        fill_exec = None
        if cfg.process_pool and cfg.backend != "numpy":
            log.warning(
                "--process-pool requires the numpy backend (forked workers "
                "cannot share a jax runtime); falling back to the thread pool"
            )
        if cfg.process_pool and cfg.backend == "numpy":
            import concurrent.futures
            import multiprocessing

            _POOL_STATE["builder"] = builder
            _POOL_STATE["cfg"] = cfg
            from ..utils.procs import pool_worker_init

            executor = concurrent.futures.ProcessPoolExecutor(
                max_workers=cfg.max_concurrent_batches,
                mp_context=multiprocessing.get_context("fork"),
                initializer=pool_worker_init,
            )

            async def worker(batch: engine.Batch):
                return await loop.run_in_executor(
                    executor, _pool_worker, batch.records
                )
        elif cfg.lookahead_fill and len(my_batches) > 1:
            # lookahead Bloom fill (reference BF-server concurrency,
            # goldpolish_targeted_bfs.cpp:177-238): a dedicated thread fills
            # batch N+1's filters while batch N polishes, so the fill never
            # sits serially at the head of a batch.  One thread — the native
            # fill releases the GIL and parallelizes over k internally.
            import concurrent.futures as _cf
            import threading as _threading
            import time as _time2

            fill_exec = _cf.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="bf-fill"
            )
            fill_futs: dict = {}
            fill_started: set = set()
            fill_lock = _threading.Lock()
            fill_done_cv = _threading.Condition(fill_lock)
            pos_of = {b.index: p for p, b in enumerate(my_batches)}

            def _timed_fill(ids):
                t0 = _time2.monotonic()
                bfs = build_batch_bfs(builder, cfg, ids)
                return bfs, _time2.monotonic() - t0

            def _ensure_fill(pos: int, required: bool = False):
                if not 0 <= pos < len(my_batches):
                    return None
                b = my_batches[pos]
                # checkpoint-resumed batches replay from disk — don't
                # pre-fill their filters (a lookahead/device fill for a
                # skipped batch is never consumed: wasted work, and its
                # future would pin filters + count against the device
                # claim bound forever).  A declined replay re-enters via
                # the worker with required=True.
                if not required and manifest and b.index in manifest.done:
                    return None
                with fill_lock:
                    fut = fill_futs.get(b.index)
                    if fut is None and b.index not in fill_started:
                        ids = [h.split()[0] for h, _ in b.records]
                        fut = fill_exec.submit(_timed_fill, ids)
                        fill_started.add(b.index)
                        fill_futs[b.index] = fut
                return fut

            if (
                cfg.fill_overlap and cfg.backend in ("hybrid", "jax")
                and not cfg.device_bf_build
            ):
                # fast-mode overlapped fill (opt-in; see PipelineConfig):
                # the device claims fill batches from the TAIL while the
                # host lookahead works the front — whoever claims first
                # fills; device-claimed batches get the documented
                # slight-superset sort-based filters (ops/bloom_sort).
                # Claims are bounded: at most DEV_FILL_AHEAD unconsumed
                # futures may be outstanding (filters are MBs per batch —
                # an unbounded claimer would pin the whole tail resident),
                # and ANY failure lands in the future (set_exception), so
                # the consuming worker surfaces it instead of deadlocking.
                DEV_FILL_AHEAD = 3

                def _dev_fill_loop():
                    while True:
                        with fill_done_cv:
                            while len(fill_futs) >= DEV_FILL_AHEAD + 1:
                                if not fill_done_cv.wait(timeout=30):
                                    continue
                            todo = [
                                p for p in range(len(my_batches))
                                if my_batches[p].index not in fill_started
                                and not (manifest
                                         and my_batches[p].index
                                         in manifest.done)
                            ]
                            # leave the frontmost unfilled batch to the
                            # host so polish never stalls on the chip
                            if len(todo) <= 1:
                                return
                            p = todo[-1]
                            b = my_batches[p]
                            fut = _cf.Future()
                            fut._gp_dev = True  # consumers may hedge
                            fill_started.add(b.index)
                            fill_futs[b.index] = fut
                        t0 = _time2.monotonic()
                        try:
                            # everything between claim and fill sits inside
                            # this try: an exception anywhere must land in
                            # the future (a claimed-but-unresolved future
                            # blocks its consumer forever)
                            ids = [h.split()[0] for h, _ in b.records]
                            try:
                                bfs = builder.build_batch_device(ids)
                            except Exception:  # noqa: BLE001 — host fallback
                                log.warning(
                                    "device fill failed for batch %d; host "
                                    "fill fallback", b.index, exc_info=True,
                                )
                                bfs = builder.build_batch(ids)
                        except Exception as e:  # noqa: BLE001
                            fut.set_exception(e)
                            return
                        fut.set_result((bfs, _time2.monotonic() - t0))

                dev_fill_thread = _threading.Thread(
                    target=_dev_fill_loop, name="bf-fill-dev", daemon=True
                )
                dev_fill_thread.start()
                # a hedged (lost) device fill still holding a jax call at
                # interpreter teardown SIGABRTs the runtime; drain it at
                # exit (atexit handlers run before teardown, and this one
                # — registered after jax's — runs first), NOT in run_bulk
                # (which would stall the return behind a slow chip)
                import atexit as _atexit

                _atexit.register(dev_fill_thread.join, 300)

            def _next_live(pos: int) -> int:
                """First position > pos not recorded done — the lookahead
                must hop OVER resumed batches, not stop at them (a None
                there would serialize the next live batch's fill)."""
                q = pos + 1
                while (q < len(my_batches) and manifest
                       and my_batches[q].index in manifest.done):
                    q += 1
                return q

            def _hedged_result(fut, records):
                """Consume a fill future; a DEVICE-claimed fill still in
                flight when its consumer arrives gets a host-fill HEDGE —
                first finisher wins (both results are valid filter sets;
                the device's is the documented fast-mode superset).  The
                r5 bench measured the overlap stream losing to fill=host
                exactly because one slow device fill held its batch past
                the host's headroom; the hedge caps that loss at one
                host-fill time."""
                if not getattr(fut, "_gp_dev", False) or fut.done():
                    return fut.result()
                ids = [h.split()[0] for h, _ in records]
                host_fut: _cf.Future = _cf.Future()

                def run():
                    try:
                        host_fut.set_result(_timed_fill(ids))
                    except Exception as e:  # noqa: BLE001
                        host_fut.set_exception(e)

                _threading.Thread(target=run, daemon=True).start()
                first, _rest = _cf.wait(
                    {fut, host_fut}, return_when=_cf.FIRST_COMPLETED
                )
                return next(iter(first)).result()

            async def worker(batch: engine.Batch):
                pos = pos_of[batch.index]
                fut = _ensure_fill(pos, required=True)
                _ensure_fill(_next_live(pos))  # the lookahead
                batch_bfs, fill_s = await loop.run_in_executor(
                    None, _hedged_result, fut, batch.records
                )
                with fill_done_cv:
                    fill_futs.pop(batch.index, None)
                    fill_done_cv.notify_all()
                res = await loop.run_in_executor(
                    None, polish_batch_records, batch.records, builder, cfg,
                    batch_bfs,
                )
                # the fill ran off the critical path; account it separately
                res.stats["timing"]["bf_fill_bg_s"] = round(fill_s, 3)
                return res
        else:
            async def worker(batch: engine.Batch):
                return await loop.run_in_executor(
                    None, polish_batch_records, batch.records, builder, cfg
                )

        if ckpt_dir and n_hosts == 1:
            # multi-host publishes per-batch files to the reaper already;
            # only the single-host path needs the extra replay copies
            inner_worker = worker

            async def worker(batch: engine.Batch):  # noqa: F811
                res = await inner_worker(batch)
                # publish BEFORE the manifest marks done (run_pipeline marks
                # after the worker returns): a crash between the two just
                # re-polishes the batch
                dist.write_batch_output(
                    os.path.join(ckpt_dir, "out"), batch.index, res.records
                )
                return res

        def skip_result(batch: engine.Batch):
            """Replay a checkpointed batch; None declines (file vanished)."""
            if not ckpt_dir:
                return None
            path = dist.batch_path(os.path.join(ckpt_dir, "out"), batch.index)
            if not os.path.exists(path):
                log.warning(
                    "batch %d marked done but %s is missing; re-polishing",
                    batch.index, path,
                )
                return None
            recs = [(r.name, r.seq) for r in fasta.read_seqs(path)]
            totals["resumed_batches"] += 1
            return BatchResult(records=recs, stats={"timing": {}})

        if n_hosts > 1:
            import threading

            def sink_batch(index, result: BatchResult):
                dist.write_batch_output(cfg.output_seqs, index, result.records)
                for _h, s in result.records:
                    totals["contigs"] += 1
                    totals["bases_out"] += len(s)
                for key, val in result.stats.get("timing", {}).items():
                    timing_sum[key] = timing_sum.get(key, 0.0) + val

            resumable = bool(cfg.checkpoint)
            reaped = dist.reaped_through(cfg.output_seqs) if resumable else 0
            reaper = None
            if host_id == 0:
                reaper = threading.Thread(
                    target=dist.reap,
                    args=(cfg.output_seqs, len(all_batches)),
                    kwargs={"resumable": resumable},
                )
                reaper.start()

            async def run_all():
                sem = asyncio.Semaphore(cfg.max_concurrent_batches)

                async def one(b):
                    async with sem:
                        # resume: a batch recorded done whose output either
                        # already reached the final FASTA (reaper progress)
                        # or still sits published for the reaper needs no
                        # re-polish
                        if manifest and b.index in manifest.done and (
                            b.index < reaped
                            or os.path.exists(
                                dist.batch_path(cfg.output_seqs, b.index)
                            )
                        ):
                            totals["resumed_batches"] += 1
                            # account the skipped batch in totals so resumed
                            # runs don't under-report; the published file
                            # carries exact counts, a reaped batch falls back
                            # to the input-record count (1 record in == 1 out)
                            published = dist.batch_path(
                                cfg.output_seqs, b.index
                            )
                            if os.path.exists(published):
                                for r in fasta.read_seqs(published):
                                    totals["contigs"] += 1
                                    totals["bases_out"] += len(r.seq)
                            else:
                                totals["contigs"] += len(b.records)
                            return
                        res = await worker(b)
                        sink_batch(b.index, res)
                        if manifest:
                            manifest.mark(b.index)

                await asyncio.gather(*[one(b) for b in my_batches])

            try:
                loop.run_until_complete(run_all())
                if reaper is not None:
                    reaper.join()
            finally:
                manifest.close()
                loop.close()
        else:
            writer = fasta.FastaWriter(cfg.output_seqs)

            def sink(result: BatchResult):
                for header, seq in result.records:
                    writer.write((header, seq))
                    totals["contigs"] += 1
                    totals["bases_out"] += len(seq)
                for key, val in result.stats.get("timing", {}).items():
                    timing_sum[key] = timing_sum.get(key, 0.0) + val

            try:
                loop.run_until_complete(
                    engine.run_pipeline(
                        my_batches, worker, sink,
                        max_concurrent=cfg.max_concurrent_batches,
                        manifest=manifest,
                        skip_result=skip_result if ckpt_dir else None,
                    )
                )
            finally:
                writer.close()
                manifest.close()
                loop.close()
        if executor is not None:
            executor.shutdown()
        if fill_exec is not None:
            fill_exec.shutdown()
        if ckpt_dir:
            # run complete: the final output holds everything — drop the
            # per-batch replay files and the manifest so a rerun starts fresh
            import shutil

            shutil.rmtree(ckpt_dir, ignore_errors=True)
            if cfg.checkpoint and os.path.exists(cfg.checkpoint):
                os.remove(cfg.checkpoint)
        wall = _time.monotonic() - t_start
        totals["timing"] = {"wall_s": round(wall, 3), "setup_s": round(t_setup, 3),
                            **{k: round(v, 3) for k, v in timing_sum.items()}}
        log.info(
            "polished %d contigs (%d bases) in %d batches -> %s",
            totals["contigs"], totals["bases_out"], totals["batches"],
            cfg.output_seqs,
        )
        log.info(
            "timing: wall %.1fs, setup %.1fs; batch-stage sums: %s",
            wall, t_setup,
            " ".join(f"{k}={v:.1f}s" for k, v in sorted(timing_sum.items())),
        )
        return totals
    finally:
        ws.cleanup()
