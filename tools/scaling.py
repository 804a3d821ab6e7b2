#!/usr/bin/env python3
"""Regenerate SCALING.md — the consolidated per-query scaling index.

Inputs are the machine-readable sweep records BenchSweep writes with
SPARK_GRAFT_SWEEP_JSON (best steady-state rep per query):

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_SWEEP_JSON=SCALING_sf01.json \
      sbt -batch "runMain graft.tools.BenchSweep <all queries> 2"
    SPARK_GRAFT_SF_DIR=/tmp/graftdata/sf1   \
      SPARK_GRAFT_SWEEP_JSON=SCALING_sf1.json ... (ScaleGen 10 fixture)

    python3 tools/scaling.py SCALING_sf01.json SCALING_sf1.json > SCALING.md

The sf1 fixture (graft.tools.ScaleGen) scales documents / embeddings /
events / customer 10x; the TPC-H-ish tables are copied unscaled. A
query whose inputs are all unscaled therefore SHOULD sit at ~1x — the
table marks those 'fixed-input' instead of crediting them with
sublinearity. Input tables per query are parsed from the SparkEntry
source (T(s, dir, "<table>") references inside each query's block).
"""
import json
import re
import sys

SCALED = {"documents", "embeddings", "events", "customer"}
# The registry is split by family since r16 — parse every trait file.
import glob as _glob
ENTRY_GLOB = "src/main/scala/graft/entry/Entry*.scala"

# Queries whose RESULT grows faster than the corpus by construction:
# ScaleGen reproduces the driver fixture's "5% near-dup of an EARLIER
# doc" recipe, so true near-dup PAIR counts grow superlinearly with
# corpus size — these ops are output-bound (cost ∝ their own answer),
# not algorithmically superlinear. MEASURED sf0.1→sf1 output rows
# (graft.tools.SimhashAudit / CountRows; BASELINE.md r17 density
# audit): q31 (full corpus) 83,078→9,262,736 (111×) — the 32-bit
# hamming ball saturates on this corpus; since r18 q31 runs a QUARTER
# slice (bench hygiene) and q41 is retired, but the slice's output is
# still pair-dense by the same recipe (q294 is the 64-bit fix whose
# output is 312→13,564). q279's residual term is the
# fingerprint-capacity saturation documented in AudioDedup (bank
# width is the dial).
OUTPUT_BOUND = {
    "q31_simhash_pairs", "q279_audio_neardup",
    # q294: measured output 312 -> 13,564 true pairs (43x at 10x; the
    # ScaleGen 5%-near-dup-of-an-EARLIER-doc recipe densifies pairs
    # superlinearly by construction); runtime 35x sits BELOW output
    # growth and the candidate join is under the default 25M-pair
    # fence (hottest bucket 9.19M pairs, BASELINE r17 density audit)
    "q294_simhash64_pairs",
}


def query_tables(src):
    """query name -> set of fixture tables its block references."""
    # split on query-entry anchors; each block runs to the next anchor
    anchors = [(m.start(), m.group(1))
               for m in re.finditer(r'"(q\d+[a-z0-9_]*)" -> \(\(s, dir\)', src)]
    out = {}
    for i, (pos, name) in enumerate(anchors):
        end = anchors[i + 1][0] if i + 1 < len(anchors) else len(src)
        block = src[pos:end]
        tables = set(re.findall(r'T\(s, dir, "(\w+)"\)', block))
        tables |= set(re.findall(r'readEvents\(s, s?"?\$?dir/(\w+)\.parquet', block))
        # helper indirection: the demo media/tone/video tables read documents
        if ("demoImageTable" in block or "demoToneTable" in block
                or "demoVideoTable" in block or "imageIngestPairs" in block):
            tables.add("documents")
        for helper in ("durableVecIndex", "corpusVecIndex", "forgottenVecIndex",
                       "maintainedVecReport", "pqBooks", "annGraph",
                       "durableGraphIndex", "insertedGraphIndex"):
            if helper in block:
                tables.add("embeddings")
        for helper in ("durableSigIndex", "durableWinIndex", "forgottenWinIndex",
                       "corpusVecIndex", "clusterLabels", "verifiedPairs"):
            if helper in block:
                tables.add("documents")
        out[name] = tables
    return out


def classify(name, r01, r1, tables):
    if r1 is None or r01 is None:
        return "missing"
    if tables and not (tables & SCALED):
        return "fixed-input"
    ratio = r1 / r01 if r01 > 0 else float("inf")
    if ratio > 13.0 and name in OUTPUT_BOUND:
        return "output-∝ (pair density; see note)"
    if ratio <= 1.3:
        return "overhead-bound (~flat)"
    if ratio <= 4.0:
        return "sublinear"
    if ratio <= 13.0:
        return "~linear"
    return "SUPERLINEAR"


def main():
    sf01 = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    # parse PER FILE: on a concatenated string each file's last query
    # block would bleed into the next file's helper preamble and absorb
    # its T(s, dir, ...) references
    tables = {}
    for f in sorted(_glob.glob(ENTRY_GLOB)):
        tables.update(query_tables(open(f).read()))
    names = sorted(set(sf01) | set(sf1))
    rows = []
    for n in names:
        a, b = sf01.get(n), sf1.get(n)
        regime = classify(n, a, b, tables.get(n, set()))
        ratio = (b / a) if (a and b and a > 0) else None
        rows.append((n, a, b, ratio, regime))

    print("# SCALING — per-query sf0.1 → sf1 index (generated; do not edit)")
    print()
    print("Regenerated by `tools/scaling.py` from BenchSweep JSON records")
    print("(best steady-state rep, local[32]). sf1 = ScaleGen 10× fixture:")
    print("documents/embeddings/events/customer scale 10×, TPC-H tables are")
    print("copied unscaled — queries reading only those are 'fixed-input'")
    print("(a ~1× ratio there is expected, not evidence of sublinearity).")
    print()
    sup = [r for r in rows if r[4] == "SUPERLINEAR"]
    print(f"**{len(rows)} queries; {len(sup)} superlinear.**"
          + ("" if not sup else " ⚠ " + ", ".join(r[0] for r in sup)))
    print()
    slow = sorted((r for r in rows if r[2]), key=lambda r: -r[2])[:10]
    print("Slowest at sf1: "
          + ", ".join(f"{n} {b:.1f}s" for n, _, b, _, _ in slow))
    print()
    print("| Query | sf0.1 (s) | sf1 (s) | ratio | regime |")
    print("|---|---|---|---|---|")
    for n, a, b, ratio, regime in rows:
        fa = f"{a:.2f}" if a is not None else "—"
        fb = f"{b:.2f}" if b is not None else "—"
        fr = f"{ratio:.2f}×" if ratio is not None else "—"
        print(f"| {n} | {fa} | {fb} | {fr} | {regime} |")


if __name__ == "__main__":
    main()
