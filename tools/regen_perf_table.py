"""Regenerate the README per-step perf table from a run's ``timing.json``.

The reference's only published end-to-end benchmark is the example cube 2
run (``/root/reference/docs/instructions.rst:87-112``: 1100x1100x600 =
0.726 GVx on a 20-core Xeon + 2x Quadro RTX 5000). This script normalizes
a ``examples/start.py`` timing artifact to the same seconds-per-GVx scale
and prints the markdown table the README embeds, so the numbers in the
README always come from a committed artifact instead of a transcript.

Usage:
    python tools/regen_perf_table.py <wd>/timing.json [--copy TIMING_r05.json]
"""

from __future__ import annotations

import argparse
import json
import shutil

# reference per-step seconds at 0.726 GVx (instructions.rst:87-112)
REF_GVX = 0.726
REF_STEPS = [
    ("[2] Dense predictions (myelin, mag 4)", "Dense predictions", 62.0),
    ("[3] SD generation (extract + props + meshes)", "SD generation", 235.0),
    ("[4] SSD generation", "SSD generation", 33.0),
    ("[5] Skeleton generation", "Skeleton generation", 515.0),
    ("[6] Synapse detection", "Synapse detection", 335.0),
    ("[7] Contact detection", "Contact detection", None),  # disabled there
    ("[8] Compartment predictions", "Compartment predictions", 364.0),
    ("[9] Morphology extraction", "Morphology extraction", 127.0),
    ("[10] Celltype analysis", "Celltype analysis", 143.0),
    ("[11] Matrix export", "Matrix export", 7.0),
]


def render(timing: dict) -> str:
    gvx = float(timing["gvx"])
    steps = timing["steps_s"]
    rows = []
    tot_ref = tot_ours = 0.0
    for label, key, ref_s in REF_STEPS:
        ours = steps.get(key)
        if ref_s is None:
            cell = f"{ours:.2f} s" if ours is not None else "-"
            rows.append(f"| {label} | (disabled) | {cell} | - | - | - |")
            continue
        if ours is None:
            rows.append(f"| {label} | {ref_s:.0f} s | (not run) | "
                        f"{ref_s / REF_GVX:.0f} | - | - |")
            continue
        tot_ref += ref_s
        tot_ours += ours
        r_norm, o_norm = ref_s / REF_GVX, ours / gvx
        rows.append(
            f"| {label} | {ref_s:.0f} s | {ours:.1f} s | {r_norm:.0f} | "
            f"{o_norm:.0f} | {r_norm / o_norm:.2f}x |")
    r_norm, o_norm = tot_ref / REF_GVX, tot_ours / gvx
    rows.append(
        f"| **Total [2]-[11]** | **{tot_ref:.0f} s** | **{tot_ours:.1f} s** "
        f"| **{r_norm:.0f}** | **{o_norm:.0f}** | **{r_norm / o_norm:.2f}x** |")
    head = ("| Step | Reference | Ours | s/GVx ref | s/GVx ours | Speedup |\n"
            "|---|---|---|---|---|---|")
    shp = "x".join(str(s) for s in timing["shape"])
    meta = (f"run: {shp} = {gvx:.3f} GVx, {timing.get('n_cells', '?')} cells, "
            f"world={timing.get('world', '?')}; total [2]-[11] "
            f"{tot_ours:.1f} s -> {gvx * 1e3 / tot_ours:.3f} Mvox/s "
            f"(reference {REF_GVX * 1e3 / tot_ref:.3f} Mvox/s)")
    return meta + "\n" + head + "\n" + "\n".join(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("timing_json")
    ap.add_argument("--copy", default="",
                    help="also copy the timing artifact to this repo path")
    args = ap.parse_args()
    with open(args.timing_json) as f:
        timing = json.load(f)
    print(render(timing))
    if args.copy:
        shutil.copy(args.timing_json, args.copy)
        print(f"\ncopied -> {args.copy}")


if __name__ == "__main__":
    main()
