"""Per-stage device-dispatch counts for the bench workloads.

Where `count_compiles.py` counts DISTINCT executables (first-run relay AOT
cost), this counts executable INVOCATIONS (steady-state relay round-trips:
~25 ms each on the axon relay). Runs on the CPU backend — dispatch counts
depend only on program structure and shapes, so they match the TPU run.

Usage:  python tools/count_dispatches.py [pano100|6view] ...
"""

import contextlib
import json
import os
import sys

os.environ.setdefault("AUTOPANO_DISABLE_COMPILE_CACHE", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


class _StageFanout:
    """Fan one pipeline `timer` argument out to several stage contexts."""

    def __init__(self, *sinks):
        self.sinks = sinks

    @contextlib.contextmanager
    def stage(self, name: str):
        with contextlib.ExitStack() as es:
            for s in self.sinks:
                es.enter_context(s.stage(name))
            yield


def main():
    import count_compiles  # same directory: reuses the workload builders

    from autopanostitch_tpu.utils.timing import DispatchCounter

    names = sys.argv[1:] or ["pano100"]
    for nm in names:
        run = count_compiles.WORKLOADS[nm]
        import bench
        from autopanostitch_tpu.models import pipeline

        # rebuild the workload inputs exactly as the bench section does,
        # then run stitch once under the counter with stage attribution
        if nm == "pano100":
            b = bench.build_pano(100)
        elif nm == "6view":
            b = bench.build_6view()
        else:
            # fallback: run the count_compiles workload without stages
            with DispatchCounter() as dc:
                run()
            print(json.dumps({"workload": nm, "total": dc.total}))
            continue
        dc = DispatchCounter()
        with dc:
            pipeline.stitch(b["iset"], b["cfg"], timer=_StageFanout(dc))
        print(json.dumps({
            "workload": nm,
            "total": dc.total,
            "per_stage": dc.per_stage,
            "unattributed": dc.total - sum(dc.per_stage.values()),
        }, indent=2))
        top = sorted(dc.by_name.items(), key=lambda kv: -kv[1])[:25]
        for name, cnt in top:
            print(f"{cnt:5d}  {name}")


if __name__ == "__main__":
    main()
