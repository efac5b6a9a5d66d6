"""Generate initial-domain datasets (snapshots + uncontrolled episodes +
statistics) for an env config, batching the burn-ins over a vmapped lane axis.

Produces exactly the files ``FluidEnv.init()`` produces (reference
fluid_env.py:1114-1190, util/data_utils.py:23-136) -- ``{mode}_{idx:02d}``
domain snapshots, ``{mode}_{idx:02d}_uncontrolled_episode.csv`` baselines, and
``domain_statistics.json`` -- but runs the independent per-snapshot burn-ins
in lockstep as one jitted vmapped program (the per-lane convergence masking in
solver/linsolve.py keeps each lane's physics identical to a single-env run).

Usage:
    python scripts/generate_datasets.py CylinderJet2D-easy-v0 \
        [--n-domains 10] [--lanes 10] [--episode-steps N] [--burnin-scale 1.0]
        [--bundle] [--env-kw key=value ...]

``--bundle`` copies the finished dataset into ``fluidgym_tpu/data/`` so it
ships with the package (the air-gapped stand-in for the reference's
HuggingFace distribution).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


import _heartbeat  # noqa: E402  (repo scripts/ dir, added to sys.path above)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
    _heartbeat.touch()


def build_jobs(env, n_domains: int, burnin_scale: float):
    """(mode, idx, seed, burn_steps, extra_steps) burn-in jobs mirroring
    FluidEnv.init() stage 1, including the +-15% jitter drawn from the env's
    seeded rng right after reset (fluid_env.py:1156-1166)."""
    from fluidgym_tpu.envs.fluid_env import MODE_SEEDS
    from fluidgym_tpu.types import EnvMode

    jobs = []
    base = env._initial_domain_steps
    gen_modes = (list(MODE_SEEDS) if env._initial_domain_restart
                 else [EnvMode.TRAIN])
    for idx in range(n_domains):
        for mode in gen_modes:
            seed = MODE_SEEDS[mode] + idx
            jobs.append((mode, idx, seed))
    out = []
    for mode, idx, seed in jobs:
        env.seed(seed)
        steps = int(round(base * burnin_scale))
        jitter = int(round(steps * 0.15))
        if jitter:
            steps = int(steps + env._np_rng.integers(-jitter, jitter + 1))
        extra = 0 if env._initial_domain_restart else max(1, int(steps * 0.1))
        out.append((mode, idx, seed, steps, extra))
    return out


def run_stage1(env, jobs, lanes: int, transient_env=None,
               transient_steps: int = 0, transient_split: int = 1) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidgym_tpu.types import EnvMode

    todo = [j for j in jobs
            if not env._check_initial_domains_exist(
                mode=j[0] if env._initial_domain_restart else None,
                idx=j[1], user_only=True)]
    if not todo:
        log("stage 1: all snapshots exist; skipping")
        return
    log(f"stage 1: {len(todo)} burn-in jobs in chunks of {lanes}")

    step_fn = None
    # TPU per-device-call watchdog (~2 min): the impulsive-start transient can
    # push the adaptive CFL loop to hundreds of substeps in ONE call.  For the
    # first `transient_steps` logical steps, advance via `transient_env`
    # (step_length / transient_split) in `transient_split` shorter calls.
    transient_fn = None
    if transient_env is not None and transient_steps > 0:
        transient_fn = jax.jit(jax.vmap(transient_env._pure_step))
    for c0 in range(0, len(todo), lanes):
        chunk = todo[c0:c0 + lanes]
        carries, events = [], []
        for mode, idx, seed, steps, extra in chunk:
            env.mode = mode
            env.reset(seed=seed, randomize=False)
            carries.append(env._pure_carry())
            if env._initial_domain_restart:
                events.append([(steps, mode, idx)])
            else:
                events.append([(steps, EnvMode.TRAIN, idx),
                               (steps + extra, EnvMode.VAL, idx),
                               (steps + 2 * extra, EnvMode.TEST, idx)])
        bcarry = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *carries)
        bact = jnp.broadcast_to(env._zero_action,
                                (len(chunk),) + env._zero_action.shape)
        if step_fn is None:
            step_fn = jax.jit(jax.vmap(env._pure_step))
        horizon = max(ev[-1][0] for ev in events)
        # Mid-burn-in checkpointing (FLUIDGYM_BURNIN_CKPT=N steps, 0=off):
        # the silent axon-tunnel wedge can freeze a client mid-march with no
        # error, and the chain watchdog then loses the whole chunk.  Host
        # states pickle in ~seconds; a killed step relaunches and resumes
        # from the last checkpoint instead of t=0.
        ckpt_every = int(os.environ.get("FLUIDGYM_BURNIN_CKPT", "0") or 0)
        ckpt_path = None
        t0 = 1
        if ckpt_every > 0:
            import pickle

            from fluidgym_tpu.utils import data_utils
            root = data_utils.initial_domain_dir(env.initial_domain_id,
                                                 write=True)
            root.mkdir(parents=True, exist_ok=True)
            ckpt_path = root / f"_burnin_ckpt_{c0 // lanes}.pkl"
            job_key = [(m.value, i) for m, i, *_ in chunk]
            if ckpt_path.exists():
                try:
                    saved = pickle.loads(ckpt_path.read_bytes())
                except Exception:
                    saved = None
                if saved and saved["jobs"] == job_key \
                        and saved["horizon"] == horizon:
                    bcarry = jax.tree.map(
                        lambda *xs: jnp.stack(xs, axis=0), *saved["carries"])
                    t0 = saved["t"] + 1
                    for ev in events:  # snapshots before the ckpt are saved
                        while ev and ev[0][0] <= saved["t"]:
                            ev.pop(0)
                    log(f"  chunk {c0 // lanes}: RESUMED from burn-in "
                        f"checkpoint at t={saved['t']}")
        log(f"  chunk {c0 // lanes}: {len(chunk)} lanes, horizon {horizon}"
            + (f" (from t={t0})" if t0 > 1 else ""))
        t_wall = time.perf_counter()
        t_last_log = t_wall
        for t in range(t0, horizon + 1):
            if transient_fn is not None and t <= transient_steps:
                for _ in range(transient_split):
                    bcarry, *_ = transient_fn(bcarry, bact)
            else:
                bcarry, *_ = step_fn(bcarry, bact)
            for lane, ev in enumerate(events):
                while ev and ev[0][0] == t:
                    _, mode, idx = ev.pop(0)
                    lane_carry = jax.device_get(
                        jax.tree.map(lambda a: a[lane], bcarry))
                    # never save a diverged state: NaNs would poison the
                    # bundled dataset silently (reset/obs go NaN for every
                    # user of the config)
                    if not all(np.isfinite(x).all()
                               for x in jax.tree.leaves(lane_carry)):
                        log(f"    !!! lane {lane} NOT FINITE at t={t}; "
                            f"skipping {mode.value}_{idx:02d} "
                            f"(burn-in diverged)")
                        continue
                    env._set_pure_carry(lane_carry)
                    note = ""
                    if hasattr(env, "snapshot_turbulence_ratio"):
                        ratio = env.snapshot_turbulence_ratio()
                        note = f" (v'/u_tau {ratio:.3f})"
                        if ratio < 0.15:
                            log(f"    !!! {mode.value}_{idx:02d} looks "
                                f"RELAMINARIZED (v'/u_tau {ratio:.3f}; "
                                f"healthy 0.3-0.65) — saving anyway, but "
                                f"the episode screen will flag it")
                    env._save_initial_domain(mode, idx)
                    log(f"    saved {mode.value}_{idx:02d} at t={t}{note}")
            # block every 50 steps: async dispatch makes the wall-clock
            # branch useless (the loop queues hundreds of steps in seconds
            # then sits in ONE long block_until_ready, during which this
            # client prints nothing — at 3D rates the 200-step cadence
            # races the chain's silence watchdog)
            if t % 50 == 0 or time.perf_counter() - t_last_log > 240:
                jax.block_until_ready(jax.tree.leaves(bcarry)[0])
                rate = (t - t0 + 1) / (time.perf_counter() - t_wall)
                log(f"    t={t}/{horizon} ({rate:.2f} lockstep steps/s)")
                t_last_log = time.perf_counter()
            if ckpt_path is not None and t % ckpt_every == 0 and t < horizon:
                import pickle
                host = jax.device_get(bcarry)
                lane_carries = [jax.tree.map(lambda a: a[i], host)
                                for i in range(len(chunk))]
                tmp = ckpt_path.with_suffix(".tmp")
                tmp.write_bytes(pickle.dumps({
                    "jobs": [(m.value, i) for m, i, *_ in chunk],
                    "horizon": horizon, "t": t, "carries": lane_carries}))
                tmp.replace(ckpt_path)
        if ckpt_path is not None:
            ckpt_path.unlink(missing_ok=True)


def _roll_episode(step_fn, bcarry, bact, episode_steps: int, n_lanes: int,
                  label: str):
    """Advance the vmapped program ``episode_steps`` steps collecting the
    per-lane scalar info rows; returns (rows_per_lane, final carry).
    Progress is logged on BOTH a step cadence and a wall-clock cadence so a
    slow family (airfoil: ~0.1 steps/s) never trips the chain's external
    log-silence watchdog between chunk lines."""
    import jax
    import numpy as np

    rows_per_lane: list[list[dict]] = [[] for _ in range(n_lanes)]
    t_wall = time.perf_counter()
    t_last_log = t_wall
    for t in range(episode_steps):
        bcarry, _, _, info = step_fn(bcarry, bact)
        host_info = jax.device_get(
            {k: v for k, v in info.items()
             if hasattr(v, "size") and v.size == n_lanes})
        for lane in range(n_lanes):
            rows_per_lane[lane].append(
                {k: float(np.asarray(v).reshape(-1)[lane])
                 for k, v in host_info.items()})
        if (t + 1) % 25 == 0 or time.perf_counter() - t_last_log > 240:
            rate = (t + 1) / (time.perf_counter() - t_wall)
            log(f"  {label}: t={t + 1}/{episode_steps} ({rate:.2f} steps/s)")
            t_last_log = time.perf_counter()
    return rows_per_lane, bcarry


def run_stage2(env, n_domains: int, episode_steps: int, lanes: int,
               checkpoint=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidgym_tpu.envs.fluid_env import MODE_SEEDS
    from fluidgym_tpu.utils import data_utils

    jobs = [(mode, idx) for mode in MODE_SEEDS for idx in range(n_domains)]
    all_rows: list[dict] = []
    todo, repairs = [], []
    for mode, idx in jobs:
        try:
            rows = [{k: float(v) for k, v in r.items()}
                    for r in data_utils.load_uncontrolled_episode(
                        env.initial_domain_id, mode.value, idx)]
            if len(rows) >= episode_steps:
                violations = env.episode_sanity_violations(rows)
                if violations:
                    # a previously recorded trace that fails the screen gets
                    # its snapshot repaired (extended burn-in) + re-recorded
                    log(f"  reused episode {mode.value}_{idx:02d} fails "
                        f"sanity ({'; '.join(violations)}); queued for repair")
                    # prior=None: the stale CSV may predate solver fixes, so
                    # the repair re-records from the unmodified snapshot first
                    repairs.append((mode, idx, None))
                else:
                    all_rows.extend(rows)
                continue
        except FileNotFoundError:
            pass
        todo.append((mode, idx))
    log(f"stage 2: {len(todo)} episodes of {episode_steps} steps "
        f"({len(jobs) - len(todo) - len(repairs)} reused, "
        f"{len(repairs)} repairs)")

    step_fn = (jax.jit(jax.vmap(env._pure_step))
               if (todo or repairs) else None)

    # Repairs of previously shipped-bad episodes run FIRST: under the
    # chain's step timeout, the fresh-episode long tail must never starve
    # the repair queue (it did exactly that twice — the advisor-HIGH
    # Airfoil2D-medium contamination survived rounds 2 and 3 because the
    # repair phase sat behind ~4h of new-episode recording).  Statistics
    # are re-pooled immediately after so a later kill still ships a
    # decontaminated zero-point.
    if repairs:
        all_rows.extend(run_repairs(
            env, repairs, episode_steps, lanes, step_fn,
            compiled_width=lanes))
        repairs = []
        if all_rows:
            env._save_domain_statistics(env._pool_statistics_rows(all_rows))
            log("saved domain_statistics.json (interim post-repair pooling)")
        if checkpoint is not None:
            # ship the repaired episodes + interim statistics NOW: bundling
            # only at the end of main() lost the repair to step timeouts in
            # rounds 2-4 (the fresh-episode tail exceeded the cap)
            checkpoint()

    for c0 in range(0, len(todo), lanes):
        chunk = todo[c0:c0 + lanes]
        carries = []
        for mode, idx in chunk:
            env.mode = mode
            env.load_initial_domain(mode, idx, user_only=True)
            env.seed(MODE_SEEDS[mode] + idx)
            carries.append(env._pure_carry())
        bcarry = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *carries)
        bact = jnp.broadcast_to(env._zero_action,
                                (len(chunk),) + env._zero_action.shape)
        rows_per_lane, _ = _roll_episode(step_fn, bcarry, bact, episode_steps,
                                         len(chunk), f"chunk {c0 // lanes}")
        for lane, (mode, idx) in enumerate(chunk):
            rows = rows_per_lane[lane]
            violations = env.episode_sanity_violations(rows)
            if violations:
                log(f"  episode {mode.value}_{idx:02d} fails sanity "
                    f"({'; '.join(violations)}); queued for repair")
                # prior=rows: this exact trace was just recorded by the
                # current program — repairs skip the redundant re-record and
                # go straight to the burn-in extension
                repairs.append((mode, idx, rows))
                continue
            data_utils.save_uncontrolled_episode(
                env.initial_domain_id, mode.value, idx, rows)
            all_rows.extend(rows)
            log(f"  saved episode {mode.value}_{idx:02d}")

    if repairs:
        all_rows.extend(run_repairs(
            env, repairs, episode_steps, lanes, step_fn,
            compiled_width=min(lanes, len(todo)) if todo else None))

    if all_rows:
        env._save_domain_statistics(env._pool_statistics_rows(all_rows))
        log("saved domain_statistics.json (screened pooling)")


def _march(step_fn, bcarry, bact, n_steps: int, label: str):
    """Advance ``n_steps`` zero-action steps, logging on a wall-clock
    cadence: a 200-step extension is ~40 min of otherwise total log
    silence on the airfoil, which outlives the heartbeat's 30-min grace
    and gets the step watchdog-killed right before the extended
    snapshots would have been saved (observed live, round 4)."""
    import time as _time

    t0 = _time.perf_counter()
    t_log = t0
    for i in range(n_steps):
        bcarry, *_ = step_fn(bcarry, bact)
        if _time.perf_counter() - t_log > 240:
            log(f"  {label}: t={i + 1}/{n_steps} "
                f"({(i + 1) / (_time.perf_counter() - t0):.2f} steps/s)")
            t_log = _time.perf_counter()
    return bcarry


def run_repairs(env, repairs, episode_steps: int, lanes: int,
                step_fn=None, compiled_width=None) -> list[dict]:
    """Lane-parallel repair protocol (mirrors
    ``FluidEnv._record_uncontrolled_episode``: re-record, and on sanity
    failure extend the snapshot's burn-in by 50% of the configured burn-in
    and try again, up to 3 attempts, always shipping the best attempt).

    ``repairs`` entries are ``(mode, idx)`` or ``(mode, idx, prior_rows)``.
    ``prior_rows`` — a trace this run already recorded from the unmodified
    snapshot — seeds the best-attempt tracking and sends the episode
    straight to the burn-in extension (re-recording it would reproduce the
    identical failing rows).  Entries without prior rows (stale on-disk
    CSVs that may predate solver fixes) are re-recorded first.

    All device work goes through the SAME vmapped lockstep program stage 2
    compiled (``compiled_width`` lanes; short chunks are padded to it), so
    the repair phase never triggers a fresh ``_pure_step`` compile — the
    unbatched one stalled log-silent for >25 min on the TPU chain and got
    the step watchdog-killed.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidgym_tpu.envs.fluid_env import MODE_SEEDS
    from fluidgym_tpu.utils import data_utils

    repairs = [r if len(r) == 3 else (r[0], r[1], None) for r in repairs]
    all_rows: list[dict] = []
    # (mode, idx) -> (score, rows); score = (1 if violations else 0, bad_frac)
    best: dict[tuple, tuple] = {}
    # FLUIDGYM_REPAIR_EXTRA overrides the burn-in extension length: at the
    # airfoil-medium hardware rate (~13 s per 6-lane step) the default 200
    # steps is ~45 min per attempt, which no chain window fits
    if "FLUIDGYM_REPAIR_EXTRA" in os.environ:
        extra = max(0, int(os.environ["FLUIDGYM_REPAIR_EXTRA"]))
    else:
        extra = max(1, env._initial_domain_steps // 2)
    width = compiled_width or min(lanes, len(repairs))
    if step_fn is None:
        step_fn = jax.jit(jax.vmap(env._pure_step))

    def screen(rows):
        """(violations, score) — one mask pass per trace."""
        violations = env.episode_sanity_violations(rows)
        converged, inlier = env._episode_row_masks(rows)
        bad_frac = (1.0 - float((converged & inlier).mean())
                    if rows else 1.0)
        return violations, (1 if violations else 0, bad_frac)

    def batch_carries(jobs):
        carries = []
        for mode, idx in jobs:
            env.mode = mode
            env.load_initial_domain(mode, idx, user_only=True)
            env.seed(MODE_SEEDS[mode] + idx)
            carries.append(env._pure_carry())
        bcarry = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *carries)
        bact = jnp.broadcast_to(env._zero_action,
                                (len(jobs),) + env._zero_action.shape)
        return bcarry, bact

    def save_extended_snapshots(bcarry, lanes_to_save, n_steps):
        for lane, mode, idx in lanes_to_save:
            lane_carry = jax.device_get(
                jax.tree.map(lambda a: a[lane], bcarry))
            if not all(np.isfinite(x).all()
                       for x in jax.tree.leaves(lane_carry)):
                log(f"    !!! extended burn-in for {mode.value}_{idx:02d} "
                    f"NOT FINITE; keeping the original snapshot")
                continue
            env._set_pure_carry(lane_carry)
            env._save_initial_domain(mode, idx)
            log(f"    extended burn-in by {n_steps} steps and re-saved "
                f"{mode.value}_{idx:02d}")

    # Pre-extension pass: episodes whose failing trace was just recorded by
    # this very program skip the redundant attempt-0 re-record — their
    # snapshots get the burn-in extension up front instead.
    pre = [(m, i) for m, i, prior in repairs if prior is not None]
    for m, i, prior in repairs:
        if prior is not None:
            best[(m, i)] = (screen(prior)[1], prior)
    for c0 in range(0, len(pre), width):
        chunk = pre[c0:c0 + width]
        padded = chunk + [chunk[-1]] * (width - len(chunk))
        bcarry, bact = batch_carries(padded)
        log(f"pre-extending burn-in for {len(chunk)} fresh-failure "
            f"snapshots ({extra} steps)")
        bcarry = _march(step_fn, bcarry, bact, extra, "pre-extension")
        save_extended_snapshots(
            bcarry, [(lane, m, i) for lane, (m, i) in enumerate(chunk)],
            extra)

    active = [(m, i) for m, i, _ in repairs]
    for attempt in range(3):
        if not active:
            break
        log(f"repair attempt {attempt}: {len(active)} episodes, "
            f"width={width}")
        still_failing: list[tuple] = []
        for c0 in range(0, len(active), width):
            chunk = active[c0:c0 + width]
            # pad to the compiled lane width so no new program is built
            padded = chunk + [chunk[-1]] * (width - len(chunk))
            bcarry, bact = batch_carries(padded)
            rows_per_lane, bcarry = _roll_episode(
                step_fn, bcarry, bact, episode_steps, width,
                f"repair a{attempt} chunk {c0 // width}")
            failing_lanes = []
            for lane, (mode, idx) in enumerate(chunk):
                rows = rows_per_lane[lane]
                violations, score = screen(rows)
                key = (mode, idx)
                if key not in best or score < best[key][0]:
                    best[key] = (score, rows)
                if violations:
                    log(f"  repair {mode.value}_{idx:02d} a{attempt} still "
                        f"fails ({'; '.join(violations)})")
                    failing_lanes.append((lane, mode, idx))
                    still_failing.append(key)
                else:
                    data_utils.save_uncontrolled_episode(
                        env.initial_domain_id, mode.value, idx, rows)
                    all_rows.extend(rows)
                    log(f"  repaired episode {mode.value}_{idx:02d}")
            if failing_lanes and attempt < 2:
                # extend the burn-in from the post-episode state (the episode
                # above already advanced it; keep marching so the extension
                # builds on it), then re-save the failing lanes' snapshots
                bcarry = _march(step_fn, bcarry, bact, extra,
                                f"extension a{attempt}")
                save_extended_snapshots(bcarry, failing_lanes, extra)
        # Persist the best trace so far for still-failing episodes: a chain
        # step timeout mid-repair must never leave the OLD contaminated CSV
        # on disk when a better current-code trace exists (all_rows pooling
        # still happens exactly once, at exhaustion below).
        for key in still_failing:
            data_utils.save_uncontrolled_episode(
                env.initial_domain_id, key[0].value, key[1], best[key][1])
        active = still_failing

    for mode, idx in active:  # exhausted attempts: ship the best trace
        score, rows = best[(mode, idx)]
        log(f"  !!! episode {mode.value}_{idx:02d} STILL fails sanity after "
            f"repairs; shipping the best attempt ({score[1]:.0%} bad rows) "
            f"— inspect this snapshot")
        data_utils.save_uncontrolled_episode(
            env.initial_domain_id, mode.value, idx, rows)
        all_rows.extend(rows)
    return all_rows


def bundle(env) -> None:
    from fluidgym_tpu.utils import data_utils

    src = data_utils.initial_domain_dir(env.initial_domain_id, user_only=True)
    dst = data_utils.BUNDLED_DATA / "initial_domains" / env.initial_domain_id
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in sorted(src.iterdir()):
        if f.is_file():
            shutil.copy2(f, dst / f.name)
            n += 1
    log(f"bundled {n} files -> {dst}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--n-domains", type=int, default=10)
    ap.add_argument("--lanes", type=int, default=10)
    ap.add_argument("--episode-steps", type=int, default=None)
    ap.add_argument("--burnin-scale", type=float, default=1.0)
    ap.add_argument("--transient-steps", type=int, default=0,
                    help="burn-in steps advanced in shorter device calls "
                         "(TPU watchdog mitigation for stiff transients)")
    ap.add_argument("--transient-split", type=int, default=4,
                    help="device calls per logical step during the transient")
    ap.add_argument("--bundle", action="store_true")
    ap.add_argument("--env-kw", nargs="*", default=[],
                    help="extra env kwargs as key=value (values eval'd)")
    args = ap.parse_args()

    _heartbeat.start()

    import jax


    import fluidgym_tpu

    kw = dict(load_initial_domain=False, load_domain_statistics=False,
              use_marl=False)
    for item in args.env_kw:
        k, _, v = item.partition("=")
        try:
            kw[k] = eval(v)  # noqa: S307 -- operator-supplied CLI values
        except Exception:
            kw[k] = v
    env = fluidgym_tpu.make(args.env_id, **kw)
    env._load_domain_on_reset = False
    env._enable_actions = False
    episode_steps = int(args.episode_steps or env.episode_length)

    log(f"{args.env_id} -> {env.initial_domain_id} (n={args.n_domains}, "
        f"lanes={args.lanes}, episode_steps={episode_steps}, "
        f"burnin_scale={args.burnin_scale})")
    transient_env = None
    if args.transient_steps > 0:
        # dt must shrink with step_length: n_sim_steps = max(1, step/dt)
        # floors at ONE dt-sized sim step, so without this a split call
        # advances a full dt (0.4 t-units per logical 0.25 step at split 8)
        split_len = env._step_length / args.transient_split
        transient_env = fluidgym_tpu.make(
            args.env_id, step_length=split_len,
            dt=min(env._dt, split_len), **kw)
        transient_env._load_domain_on_reset = False
        transient_env._enable_actions = False
        transient_env.reset(seed=0)

    jobs = build_jobs(env, args.n_domains, args.burnin_scale)
    run_stage1(env, jobs, args.lanes, transient_env=transient_env,
               transient_steps=args.transient_steps,
               transient_split=args.transient_split)
    run_stage2(env, args.n_domains, episode_steps, args.lanes,
               checkpoint=(lambda: bundle(env)) if args.bundle else None)
    if args.bundle:
        bundle(env)
    log("done")


if __name__ == "__main__":
    main()
