# The manual measure-before-trusting gate: run this with NOTHING else
# executing; >= ~4 GB/s aggregate = perf numbers are measurable
# (BENCH/BASELINE.md).  Thin CLI over the shared implementation so the
# bench JSON's host_bandwidth_gbps and this gate read the SAME probe.
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libpostal_ray.state.bwprobe import aggregate_bandwidth_gbps  # noqa: E402

if __name__ == "__main__":
    gbps, wall, times = aggregate_bandwidth_gbps()
    print(
        f"8-way aggregate: {gbps:.1f} GB/s "
        f"(wall {wall:.1f}s, per-proc {times[0]:.1f}-{times[-1]:.1f}s)"
    )
