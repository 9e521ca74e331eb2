#!/usr/bin/env python3
"""Rounded-grid headroom audit (r18, verdict item 2).

q150 proved the hazard class: a query that hashes round(x, k) of a
float is a cross-engine coin flip whenever some unrounded value sits
within float-noise distance of a rounding midpoint. This tool measures
that headroom for EVERY final-select round(...) site in the oracle
suite, at every scale factor:

  1. run each oracle query as-is (DuckDB), and again with its
     final-select round(expr, k) sites stripped to (expr);
  2. for each stripped column, compute the grid-relative distance to
     the nearest rounding midpoint: dist = |frac(v * 10^k) - 0.5|,
     minimized over all rows;
  3. flag anything under MARGIN (1e-5 of the grid step — i.e. the
     unrounded value sits within 1e-5 * 10^-k of a midpoint).

Margin calibration: every audited statistic is now either an exact
integer ratio (bit-identical doubles on both engines), a round-6 of a
well-conditioned O(1) float computation (cosines, avg-logs,
entropies: cross-engine noise <= ~1e-13 absolute = 1e-7 of a 1e-6
grid), or the centered covariance (measured cross-order noise 4e-17).
1e-5 of the grid therefore carries >= 100x safety against the worst
measured noise, while the PRE-fix q150 (uncentered, noise ~1e-11
absolute = 1e-5 of the grid) sat exactly AT this line — which is the
point: a statistic whose noise reaches its midpoint distance is a
coin flip, and 1e-5 is where the suite's worst historical offender
lived. Columns that land exactly ON grid points (exact ratios like
3/6, or the pageRank exact-integer 6dp projection) read dist = 0.5 —
maximally safe — by construction.

Rounds INSIDE CTEs (threshold/banding sites like q155's quantile cuts)
are intentionally not stripped — downstream comparisons consume the
rounded value by design, and stripping would change semantics. They
are counted and listed so the report is honest about coverage; their
hazard surfaces through the final-select columns they feed (the score
columns ARE audited) plus per-site custom probes where warranted
(q150: PcaSpec headroom pin; q155 cuts: the audited avg_logprob grid).

r19 adds the SIGNED-ZERO audit (the q150 r18 lesson): DuckDB
round(x, k) of a tiny negative returns IEEE -0.0 while Spark's
BigDecimal HALF_UP returns +0.0 — value-equal, byte-unequal, and the
driver hashes bytes. For every audited site this tool now ALSO
(a) runs the ORIGINAL query and bit-scans each rounded column for
-0.0 (a present -0.0 is a guaranteed hash break → hard flag), and
(b) reports which sites' unrounded distributions contain negatives
(latent: a fixture shift could land one in [-grid/2, 0) and produce
-0.0). Convention: every straddling site carries `+ 0.0` after the
final round() on BOTH engines (-0.0 + 0.0 = +0.0 in IEEE on both).

Usage: python3 tools/headroom_audit.py <verify_out_dir_with_oracle_sql>
         <sfdir> [<sfdir> ...]
Writes a markdown table to stdout; exit 1 if any site flags.
"""
import json
import re
import sys

import duckdb
import numpy as np

MARGIN = 1e-5  # grid-relative flag threshold (see calibration above)

# Inner rounding sites that deserve their own probe (the rounded value
# is consumed by a downstream comparison, so the generic final-select
# strip cannot see it): replace the source query's final SELECT with
# one that emits the UNROUNDED value(s). q155's quantile cuts are the
# canonical case — a cut near a midpoint could round differently
# across engines and re-band every doc between the two candidates.
NAMED_PROBES = {
    "q155_ccnet_ppx_bands": (
        "SELECT quantile_cont(avg_logprob, 0.3) AS lo, "
        "quantile_cont(avg_logprob, 0.7) AS hi FROM agg",
        [("lo", 6), ("hi", 6)],
    ),
    # q166-q169's trained codebook: the Lloyd means are rounded to the
    # 6dp grid INSIDE cb1 (then float32-cast) and every downstream
    # assignment/LUT/decode consumes them — a mean near a midpoint
    # could snap differently across engines and re-code every vector.
    "q166_pq_codes": (
        "SELECT mu FROM mu",
        [("mu", 6)],
    ),
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def find_round_sites(sql):
    """Paren-matched round( sites: (start, argstart, top_comma, end)."""
    sites = []
    for m in re.finditer(r"\bround\(", sql, re.IGNORECASE):
        i = m.end()
        depth, j, comma = 1, i, None
        while depth > 0 and j < len(sql):
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                comma = j
            j += 1
        sites.append((m.start(), i, comma, j))
    return sites


def final_select_pos(sql):
    """Position of the last depth-0 SELECT (the final projection)."""
    depth, last = 0, 0
    for m in re.finditer(r"\(|\)|\bSELECT\b", sql, re.IGNORECASE):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            last = m.start()
    return last


def audit_sites(sql):
    """(stripped_sql, [(colname, k)], n_inner_sites)."""
    fs = final_select_pos(sql)
    sites = find_round_sites(sql)
    finals = [s for s in sites if s[0] >= fs and s[2] is not None]
    inner = len(sites) - len(finals)
    cols = []
    out = sql
    for start, argstart, comma, end in sorted(finals, reverse=True):
        k_txt = sql[comma + 1:end - 1].strip()
        # `round(expr, k) + 0.0 AS name` is the signed-zero-normalized
        # form of the same site — audit it identically (the +0.0 shifts
        # nothing, so it can stay in the stripped query)
        m = re.match(r"\s*(?:\+\s*0\.0\s+)?AS\s+(\w+)", sql[end:],
                     re.IGNORECASE)
        if not m or not re.fullmatch(r"-?\d+", k_txt):
            inner += 1  # unnamed/odd site: counted, not audited
            continue
        cols.append((m.group(1), int(k_txt)))
        out = out[:start] + "(" + sql[argstart:comma] + ")" + out[end:]
    return out, cols, inner


def connect(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sfdir}/{t}.parquet')")
    return con


def main():
    verify_dir, sfdirs = sys.argv[1], sys.argv[2:]
    sqls = json.load(open(f"{verify_dir}/oracle_sql.json"))
    rows, flagged, inner_total = [], [], 0
    zero_rows = {}  # (name, col) -> {"neg": bool, "neg0": bool}
    for sf in sfdirs:
        con = connect(sf)
        for name in sorted(sqls):
            stripped, cols, inner = audit_sites(sqls[name])
            if sf == sfdirs[0]:
                inner_total += inner
            # -0.0 bit-scan covers EVERY float output column of EVERY
            # query — including rounds that live inside CTEs and flow
            # to the final select (the q155 shape the site audit below
            # cannot see)
            try:
                odf = con.execute(sqls[name]).df()
            except Exception as e:
                flagged.append((sf, name, f"oracle failed: {str(e)[:100]}"))
                continue
            for ocol in odf.columns:
                if odf[ocol].dtype.kind != "f":
                    continue
                bits = odf[ocol].dropna().to_numpy(dtype="float64") \
                    .view("int64")
                if (bits == np.int64(-(2 ** 63))).any():
                    zero_rows.setdefault((name, ocol),
                                         {"neg": False, "neg0": False})
                    zero_rows[(name, ocol)]["neg0"] = True
                    flagged.append((sf, name,
                                    f"{ocol}: -0.0 in rounded output"))
            if not cols:
                continue
            try:
                df = con.execute(stripped).df()
            except Exception as e:  # stripping must never hide a query
                rows.append((sf, name, "<query failed>", 0, None))
                flagged.append((sf, name, str(e)[:100]))
                continue
            for col, k in cols:
                if col not in df.columns:
                    continue
                v = df[col].dropna().astype(float)
                if len(v) == 0:
                    continue
                g = v * (10.0 ** k)
                frac = g - g.apply(lambda x: int(x) if x >= 0 else int(x) - 1)
                dist = (frac - 0.5).abs().min()
                rows.append((sf, name, col, k, dist))
                if dist < MARGIN:
                    flagged.append((sf, name, f"{col}@{k}dp dist={dist:.2e}"))
                # negatives in the unrounded distribution are the
                # LATENT signed-zero form — the site must carry `+ 0.0`
                # (the hard -0.0 scan above covers the produced form)
                z = zero_rows.setdefault((name, col),
                                         {"neg": False, "neg0": False})
                z["neg"] = z["neg"] or bool((v < 0).any())
        for name, (final_sel, probe_cols) in sorted(NAMED_PROBES.items()):
            if name not in sqls:  # subset runs (filtered Verify output)
                continue
            sql = sqls[name]
            probe_sql = sql[:final_select_pos(sql)] + final_sel
            pdf = con.execute(probe_sql).df()
            for col, k in probe_cols:
                v = pdf[col].dropna().astype(float)
                if len(v) == 0:
                    continue
                g = v * (10.0 ** k)
                frac = g - g.apply(lambda x: int(x) if x >= 0 else int(x) - 1)
                dist = (frac - 0.5).abs().min()
                rows.append((sf, f"{name} (inner probe)", col, k, dist))
                if dist < MARGIN:
                    flagged.append((sf, name, f"inner {col}@{k}dp dist={dist:.2e}"))
        con.close()
    print("# Rounded-grid headroom report")
    print()
    print(f"- final-select sites audited: "
          f"{len(set((n, c) for _, n, c, _, _ in rows))} columns; "
          f"inner (threshold/banding) sites counted: {inner_total}")
    print(f"- flag margin: grid-relative distance-to-midpoint < {MARGIN}")
    print()
    print("| query | column | k | " + " | ".join(
        "min dist " + s.rstrip('/').split('/')[-1] for s in sfdirs) + " |")
    print("|---|---|---|" + "---|" * len(sfdirs))
    byqc = {}
    for sf, name, col, k, dist in rows:
        byqc.setdefault((name, col, k), {})[sf] = dist
    for (name, col, k), per in sorted(byqc.items()):
        cells = " | ".join(
            ("-" if per.get(s) is None else f"{per[s]:.3g}") for s in sfdirs)
        print(f"| {name} | {col} | {k} | {cells} |")
    print()
    straddle = sorted(k for k, z in zero_rows.items() if z["neg"])
    neg0 = sorted(k for k, z in zero_rows.items() if z["neg0"])
    print("## Signed-zero audit")
    print()
    print(f"- sites with -0.0 in rounded output (hash break): "
          f"{len(neg0)}" + (" — " + ", ".join(
              f"{n}.{c}" for n, c in neg0) if neg0 else ""))
    print(f"- sites whose unrounded distribution contains negatives "
          f"(must carry `+ 0.0` on both engines): {len(straddle)}")
    for n, c in straddle:
        print(f"  - {n}.{c}")
    print()
    if flagged:
        print("## FLAGGED (under margin)")
        for f in flagged:
            print("-", f)
        sys.exit(1)
    print("No site under margin.")


if __name__ == "__main__":
    main()
