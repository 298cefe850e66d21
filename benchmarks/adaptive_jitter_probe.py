import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""Adaptive vs static jitter-buffer playout delay under bursty delay jitter.

The question the adaptive buffer answers: what playout delay should a slot
carry?  Static depth is a guess — too low drops late packets (PLC conceals,
quality pays), too high taxes every packet with latency.  The adaptive
buffer (native/jitter_buffer.cc AdaptDecide) measures each slot's arrival
margins and moves the delay to what the network actually needs.

Protocol: a punctual 50 Hz sender; network delay is 0 ticks in the good
state and uniform[2, J] ticks during Gilbert bursts (state machine as the
reference's loss model, reference: lyra/gilbert_model.cc:26-78 — here
modulating delay, not loss).  Each policy runs the same arrival schedule;
we report late-drop rate, shrink skips, and the time-weighted mean playout
delay (the latency actually paid).

Usage: python benchmarks/adaptive_jitter_probe.py [ticks] [max_jitter]
"""

import sys

import numpy as np

from lyra_tpu.tools.jitter_buffer import JitterBuffer


def arrival_schedule(ticks, max_jitter, seed=7,
                     p_bad=0.05, p_recover=0.25):
    """(arrive_tick, seq) pairs: Gilbert-modulated delay spikes for the
    first 60% of the run, then a calm network — the nonstationary case
    where a static depth must be wrong at one end (pay latency forever, or
    drop through every burst) and an adaptive one tracks the need."""
    rng = np.random.RandomState(seed)
    arrivals = []
    bad = False
    bursty_until = int(ticks * 0.6)
    for t in range(ticks):
        if t < bursty_until:
            bad = (rng.uniform() < (1 - p_recover)) if bad else (
                rng.uniform() < p_bad)
        else:
            bad = False
        d = rng.randint(2, max_jitter + 1) if bad else 0
        arrivals.append((t + d, t))
    return sorted(arrivals)


def run(policy, ticks, max_jitter, schedule):
    jb = JitterBuffer(capacity=1, packet_size=23, depth=32)
    if policy == "adaptive":
        jb.set_adaptive(0, 16, window=50)
        jb.add_stream(0, playout_delay=0)
    else:
        jb.add_stream(0, playout_delay=int(policy))
    by_tick = {}
    for arrive, seq in schedule:
        by_tick.setdefault(arrive, []).append(seq)
    received = 0
    delay_sum = 0
    for t in range(ticks + max_jitter + 1):
        for seq in by_tick.get(t, ()):
            jb.insert(0, seq, b"x" * 8)
        _, r, _ = jb.collect()
        received += int(r[0])
        delay_sum += jb.delay(0)
    st = jb.stats()
    ad = jb.adapt_stats()
    n = ticks + max_jitter + 1
    return {"received": received, "late": st["late_drops"],
            "skips": ad["shrinks"], "grows": ad["grows"],
            "mean_delay": delay_sum / n,
            "end_delay": jb.delay(0)}


def run_failover(ticks, max_jitter, schedule, carry, failover_at, base=2):
    """A/B for the host-move carry (serve_main._transport_state adaptive
    fields): at `failover_at` (mid-burst) the slot moves to a fresh
    buffer — heads re-seeded either WITH the learned delay/streak
    (adapt_seed, carry=True) or from the configured base (round-4
    behavior).  Reports the damage AFTER the move: late drops and silent
    playout ticks until the schedule ends."""
    jb = JitterBuffer(capacity=1, packet_size=23, depth=32)
    jb.set_adaptive(0, 16, window=50)
    jb.add_stream(0, playout_delay=base)
    by_tick = {}
    for arrive, seq in schedule:
        by_tick.setdefault(arrive, []).append(seq)
    post_received = post_silent = 0
    learned_at_move = None
    for t in range(ticks + max_jitter + 1):
        if t == failover_at:
            heads = jb.heads()
            delays, votes = jb.adapt_export()
            learned_at_move = int(delays[0])
            jb = JitterBuffer(capacity=1, packet_size=23, depth=32)
            jb.set_adaptive(0, 16, window=50)
            jb.add_stream(0, start_seq=int(heads[0]), playout_delay=base)
            if carry:
                jb.adapt_seed(0, int(delays[0]), int(votes[0]))
        for seq in by_tick.get(t, ()):
            jb.insert(0, seq, b"x" * 8)
        _, r, _ = jb.collect()
        if t >= failover_at:
            post_received += int(r[0])
            post_silent += 1 - int(r[0])
    return {"carry": carry, "learned_at_move": learned_at_move,
            "post_late": jb.stats()["late_drops"],
            "post_silent": post_silent, "post_received": post_received,
            "end_delay": jb.delay(0)}


def run_failover_burst_gap(carry, seed=7, ticks=2000, fo=1000, gap=8,
                           burst_len=60, mj=8, base=2):
    """The carry's WIN scenario, reproducibly (the source of PERF.md
    round 5's 84-vs-28 table): the jitter burst starts 30 ticks before
    the failover and continues through it, and the outage loses `gap`
    ticks of arrivals — bursts are correlated with failovers (they are
    why hosts get failed over), so this is the case worth paying for."""
    rng = np.random.RandomState(seed)
    by = {}
    for t in range(ticks):
        in_burst = (fo - 30) <= t < (fo + burst_len)
        d = rng.randint(2, mj + 1) if in_burst else 0
        by.setdefault(t + d, []).append(t)
    jb = JitterBuffer(1, 23, 32)
    jb.set_adaptive(0, 16, window=50)
    jb.add_stream(0, playout_delay=base)
    post_silent = 0
    for t in range(ticks + mj + 1):
        if t == fo:
            heads = jb.heads()
            d_, v_ = jb.adapt_export()
            jb = JitterBuffer(1, 23, 32)
            jb.set_adaptive(0, 16, window=50)
            jb.add_stream(0, start_seq=int(heads[0]), playout_delay=base)
            if carry:
                jb.adapt_seed(0, int(d_[0]), int(v_[0]))
        if not (fo <= t < fo + gap):  # the outage window loses arrivals
            for s in by.get(t, ()):
                jb.insert(0, s, b"x" * 8)
        _, r, _ = jb.collect()
        if fo <= t < fo + 200:
            post_silent += 1 - int(r[0])
    return jb.stats()["late_drops"], post_silent


def failover_sweep(ticks, max_jitter):
    """The full recorded A/B (PERF.md round 5): calm-window moves (8
    seeds x 4 move points — the carry's cost case) and burst+outage
    moves (6 seeds — its win case)."""
    calm = {False: [], True: []}
    for seed in range(8):
        sched = arrival_schedule(ticks, max_jitter, seed=seed)
        for fo in (600, 900, 1200, 1500):
            for carry in (False, True):
                r = run_failover(ticks, max_jitter, sched, carry, fo)
                calm[carry].append((r["post_late"], r["post_silent"]))
    print("calm-window moves (8 seeds x 4 points), post-move damage:")
    for carry in (False, True):
        a = np.array(calm[carry])
        label = "carried" if carry else "base restart"
        print(f"  {label:>14}: late mean {a[:, 0].mean():.2f} "
              f"max {a[:, 0].max()}, silent mean {a[:, 1].mean():.2f}")
    print("burst+outage moves (6 seeds, gap=8, burst through the move):")
    for carry in (False, True):
        tot_late = tot_silent = 0
        worst = 0
        for seed in range(6):
            late, silent = run_failover_burst_gap(carry, seed=seed,
                                                  mj=max_jitter)
            tot_late += late
            tot_silent += silent
            worst = max(worst, late)
        label = "carried" if carry else "base restart"
        print(f"  {label:>14}: {tot_late} late / {tot_silent} silent "
              f"over 6 seeds (worst seed {worst} late)")


def main():
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    max_jitter = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if "--failover-sweep" in sys.argv:
        failover_sweep(ticks, max_jitter)
        return
    if "--failover" in sys.argv:
        # The carry A/B: fail over mid-burst (40% through, inside the
        # bursty 60%), compare post-move damage with and without the
        # learned-delay carry.
        schedule = arrival_schedule(ticks, max_jitter)
        fo = int(ticks * 0.4)
        print(f"{ticks} ticks, failover at {fo} (mid-burst), "
              f"spikes uniform[2,{max_jitter}]")
        print(f"{'policy':>14} {'post late':>10} {'post silent':>12} "
              f"{'post recv':>10} {'end delay':>10}")
        for carry in (False, True):
            r = run_failover(ticks, max_jitter, schedule, carry, fo)
            label = "carried" if carry else "base restart"
            print(f"{label:>14} {r['post_late']:>10} "
                  f"{r['post_silent']:>12} {r['post_received']:>10} "
                  f"{r['end_delay']:>10}  (learned at move: "
                  f"{r['learned_at_move']})")
        return
    schedule = arrival_schedule(ticks, max_jitter)
    print(f"{ticks} ticks, delay spikes uniform[2,{max_jitter}] in Gilbert "
          f"bursts (5% entry, 25% recovery)")
    print(f"{'policy':>10} {'late drops':>11} {'skips':>6} "
          f"{'mean delay':>11} {'end delay':>10} {'received':>9}")
    for policy in ["0", "1", "2", "3", "5", "adaptive"]:
        r = run(policy, ticks, max_jitter, schedule)
        label = policy if policy == "adaptive" else f"static {policy}"
        print(f"{label:>10} {r['late']:>11} {r['skips']:>6} "
              f"{r['mean_delay']:>11.2f} {r['end_delay']:>10} "
              f"{r['received']:>9}")


if __name__ == "__main__":
    main()
