import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Controller crash-recovery cost: journal replay time and the
admission-dark window across a real fleet_main restart.

The caller's audio never touches the controller (data plane is
host-direct), so a controller outage darkens only admit/locate.  The
window = process restart + journal replay + socket rebind; this measures
the replay component at fleet scale (seats in the journal) and the
end-to-end in-process restart (thread start -> first locate answered).

Usage: python benchmarks/controller_restart_bench.py [seats...]
"""

import json
import socket
import tempfile
import threading
import time

from lyra_tpu.tools.fleet import FleetJournal, FleetRouter


class _Ctl:
    def __init__(self, addr):
        self.addr = addr

    def request(self, cmd, **kw):
        return {"ok": True}

    def close(self):
        pass


def build_journal(path, seats, hosts=4, churn_frac=0.5):
    """A realistic journal: `seats` live streams across `hosts`, plus
    churn_frac * seats admit/release pairs (history the compactor eats)."""
    r = FleetRouter(FleetJournal(path))
    cap = (seats + hosts - 1) // hosts
    for h in range(hosts):
        r.add_host(f"h{h}", ("10.0.0.1", 5620 + h),
                   _Ctl(("10.0.0.1", 5720 + h)), cap)
    for i in range(seats):
        r.admit(f"live{i}")
    for i in range(int(seats * churn_frac)):
        r.release(f"live{i}")
        r.admit(f"churn{i}")
    return r


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 16384, 65536]
    print(f"{'seats':>8} {'journal kB':>11} {'records':>8} "
          f"{'replay ms':>10}")
    for seats in sizes:
        with tempfile.TemporaryDirectory() as d:
            jp = os.path.join(d, "journal.jsonl")
            r = build_journal(jp, seats)
            n_rec = sum(1 for _ in open(jp))
            size_kb = os.path.getsize(jp) / 1024
            t0 = time.perf_counter()
            r2, open_hosts = FleetRouter.replay(
                jp, control_factory=lambda a: _Ctl(a))
            dt = (time.perf_counter() - t0) * 1e3
            assert sum(h["occupied"] for h in r2.hosts().values()) == seats
            print(f"{seats:>8} {size_kb:>11.0f} {n_rec:>8} {dt:>10.1f}")
            r.close()
            r2.close()

    # End-to-end in-process restart: fleet_main thread start (journal
    # resume) -> first locate answered, at the 16k-seat journal.
    from lyra_tpu.tools.fleet_main import main as fleet_main

    with tempfile.TemporaryDirectory() as d:
        jp = os.path.join(d, ".fleet_journal.jsonl")
        build_journal(jp, 16384).close()
        port = _free_udp_port()
        ready = threading.Event()
        stop = threading.Event()
        t0 = time.perf_counter()
        th = threading.Thread(target=fleet_main, kwargs=dict(
            argv=["--snapshot_dir", d, "--port", str(port),
                  "--watch_every", "0", "--report_every", "300",
                  "--seconds", "0"],
            _on_ready=lambda p: ready.set(), _stop=stop))
        th.start()
        assert ready.wait(60)
        t_ready = time.perf_counter() - t0
        cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        cli.settimeout(5.0)
        cli.sendto(json.dumps({"cmd": "locate", "stream": "live16000",
                               "req": "r1"}).encode(), ("127.0.0.1", port))
        reply = json.loads(cli.recv(65536).decode())
        t_locate = time.perf_counter() - t0
        assert reply["ok"], reply
        stop.set()
        th.join(timeout=30)
        cli.close()
        print(f"\nfleet_main resume at 16384 seats: admission open at "
              f"{t_ready * 1e3:.0f} ms, first locate answered at "
              f"{t_locate * 1e3:.0f} ms (plus OS process start in a real "
              f"restart)")


def _free_udp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


if __name__ == "__main__":
    main()
