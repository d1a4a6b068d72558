"""Summarize a jax.profiler trace: per-op device time, top-K table, and
derived MFU — the authoritative decomposition behind ARCHITECTURE.md's
performance claims (VERDICT r2 next-1b: back the MFU figure with a trace).

Reads the .xplane.pb files that tools/capture_trace.py writes, walks the
XSpace proto directly (tensorboard_plugin_profile is in this image; full
TensorBoard is not needed), aggregates event durations on the device
plane(s), and prints:
  * total device busy time and the wall span of the traced region,
  * the top-K ops by total self time with their share,
  * per-category rollups (conv / dot / fusion / pallas / while / infra).

The TPU's own tracer timestamps are immune to the axon tunnel's
enqueue-fake-ready and degraded-dispatch artifacts (CLAUDE.md known
backend bugs), so this is the ground truth the fetch-forced slope numbers
must reconcile with.

Usage:
  python tools/trace_summary.py traces/ [--topk 30] [--flops F] [--iters N]
    --flops: algorithmic FLOPs of ONE traced iteration (from
             utils/profiling.flops_of); with --iters, prints implied
             TFLOP/s and MFU against the v5e 197 TFLOP/s bf16 peak.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def _find_xplanes(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    hits = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    return sorted(hits)


def _category(name: str) -> str:
    n = name.lower()
    for key, cat in (
            ("pallas", "pallas-kernel"), ("mosaic", "pallas-kernel"),
            ("convolution", "conv"), ("conv", "conv"),
            ("dot", "dot"), ("einsum", "dot"),
            ("fusion", "fusion"), ("reduce", "reduce"),
            ("while", "while-overhead"), ("copy", "copy/transpose"),
            ("transpose", "copy/transpose"), ("all-reduce", "collective"),
            ("dynamic", "dynamic-slice/update"), ("scatter", "scatter"),
            ("gather", "gather"), ("infeed", "infra"), ("outfeed", "infra"),
    ):
        if key in n:
            return cat
    return "other"


def summarize(paths: list[str], topk: int = 30):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:   # plugin layouts vary across versions
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    per_op = collections.Counter()          # name -> total ps (self time)
    per_src = collections.Counter()         # source file:line -> total ps
    per_mod = collections.Counter()         # tf_op module prefix -> total ps
    per_plane_span = {}
    for p in paths:
        xspace = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            pname = plane.name
            is_device = "TPU" in pname or pname.startswith("/device:")
            is_host_xla = pname == "/host:CPU"
            if not (is_device or is_host_xla):
                continue
            # pick op-level lines only — a device plane also carries
            # module/step lines that span the same wall time (double count)
            lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
            if not lines and is_device:
                lines = [ln for ln in plane.lines
                         if "step" not in ln.name.lower()
                         and "module" not in ln.name.lower()]
            if not lines and is_host_xla:
                # CPU backend: XLA op events live on the PjRt client line
                lines = [ln for ln in plane.lines if ln.name != "python"]
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            # per-event "source" / "tf_op" stats (JAX embeds the user
            # source line and the module-scoped op name in HLO metadata) —
            # this is how the r5 small-conv hotspot was attributed to
            # models/rcnet.py CFConv and the seg decoders (ops/smallconv.py)
            stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
            md_stats = {}
            for mid, m in plane.event_metadata.items():
                d = {}
                for st in m.stats:
                    sn = stat_names.get(st.metadata_id, "")
                    if sn in ("source", "tf_op"):
                        d[sn] = st.str_value or stat_names.get(st.ref_value,
                                                               "")
                md_stats[mid] = d
            lo, hi, busy = None, None, 0
            for line in lines:
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    if (name.startswith("$") or name.startswith("Pjit")
                            or name.startswith("end:")):
                        continue        # python frames / markers
                    per_op[name] += ev.duration_ps
                    st = md_stats.get(ev.metadata_id, {})
                    per_src[st.get("source", "?")] += ev.duration_ps
                    mod = "/".join(st.get("tf_op", "?").split("/")[:4])
                    per_mod[mod] += ev.duration_ps
                    busy += ev.duration_ps
                    t0 = ev.offset_ps
                    t1 = ev.offset_ps + ev.duration_ps
                    lo = t0 if lo is None else min(lo, t0)
                    hi = t1 if hi is None else max(hi, t1)
            if busy:
                per_plane_span[pname] = (busy, (hi - lo) if lo is not None
                                         else 0)
    return per_op, per_plane_span, per_src, per_mod


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--topk", type=int, default=30)
    ap.add_argument("--flops", type=float, default=None,
                    help="algorithmic FLOPs of one traced iteration")
    ap.add_argument("--iters", type=int, default=None,
                    help="iterations inside the traced region")
    args = ap.parse_args(argv)

    paths = _find_xplanes(args.path)
    if not paths:
        print(f"no .xplane.pb under {args.path}", file=sys.stderr)
        return 1
    print(f"# {len(paths)} xplane file(s)")
    per_op, spans, per_src, per_mod = summarize(paths, args.topk)
    total_ps = sum(per_op.values())
    if not total_ps:
        print("no device events found (trace may contain only host planes)")
        return 1

    for pname, (busy, span) in spans.items():
        print(f"plane {pname}: busy {busy / 1e9:.3f} ms over a "
              f"{span / 1e9:.3f} ms span "
              f"({100 * busy / span if span else 0:.1f}% occupancy)")

    cats = collections.Counter()
    for name, ps in per_op.items():
        cats[_category(name)] += ps
    print("\n## By category")
    for cat, ps in cats.most_common():
        print(f"{100 * ps / total_ps:5.1f}%  {ps / 1e9:9.3f} ms  {cat}")

    print(f"\n## Top {args.topk} ops by total device time")
    for name, ps in per_op.most_common(args.topk):
        print(f"{100 * ps / total_ps:5.1f}%  {ps / 1e9:9.3f} ms  {name[:90]}")

    print("\n## By source line (JAX op metadata)")
    for src, ps in per_src.most_common(15):
        short = src.replace("/opt/venv/lib/python3.12/site-packages/", "")
        short = short.replace("/root/repo/tools/../", "")
        print(f"{100 * ps / total_ps:5.1f}%  {ps / 1e9:9.3f} ms  {short}")

    print("\n## By module (tf_op prefix)")
    for mod, ps in per_mod.most_common(20):
        print(f"{100 * ps / total_ps:5.1f}%  {ps / 1e9:9.3f} ms  {mod}")

    if args.flops and args.iters:
        dev_s = total_ps / 1e12
        per_iter = dev_s / args.iters
        tflops = args.flops / per_iter / 1e12
        print(f"\n## Derived: {per_iter * 1e3:.3f} ms/iter device-busy, "
              f"{tflops:.1f} TFLOP/s, MFU {tflops / 197:.3f} "
              f"(v5e 197 TFLOP/s bf16 peak)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
