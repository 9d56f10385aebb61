#!/usr/bin/env python3
"""Measure the reference library's single-node throughput on the same
synthetic oxide table the engine benches against (see BASELINE.md).

Usage:  PYTHONPATH=tools/refshim:/root/reference/src python3 tools/ref_bench.py [sfDir]

tools/refshim provides a minimal periodictable (ion-notation-aware formula
parser; atomic masses identical to graft.chem.Chem so cross-implementation
differences are algorithmic, not constants) and matplotlib stubs. CIPW is
timed on a 20k-row slice and extrapolated linearly (its cost is a per-row
Python iterrows loop)."""
import sys
import time

import pandas as pd
import pyarrow.parquet as pq


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()

    def oxframe(frame):
        ox = pd.DataFrame({
            "SiO2": 35.0 + frame["l_quantity"] * 0.3,
            "Al2O3": 15.0 + frame["l_discount"] * 50.0,
            "FeO": 18.0 + (frame["l_partkey"] % 10) * 1.1,
            "MgO": 2.0 + (frame["l_suppkey"] % 5) * 1.3,
            "CaO": 1.0 + frame["l_tax"] * 25.0,
            "MnO": 0.5 + (frame["l_linenumber"] % 3) * 0.7,
            "Na2O": 0.1 + frame["l_discount"] * 10.0,
            "K2O": 0.05 + frame["l_tax"] * 5.0,
            "TiO2": 0.3 + (frame["l_orderkey"] % 7) * 0.1,
            "Cr2O3": (frame["l_partkey"] % 3) * 0.15,
            "P2O5": 0.1 + (frame["l_suppkey"] % 4) * 0.05,
        }).astype(float)
        return ox

    ox = oxframe(li)
    n = len(ox)
    print(f"rows {n}")

    from petropandas import _calc
    from petropandas._minerals import Amp, Grt, Spl
    from petropandas.hpxeos.metapelite import TC_g

    def t(name, f):
        t0 = time.time()
        r = f()
        dt = time.time() - t0
        print(f"REF {name} {dt:.2f}s rows={len(r)}")

    t("p01_moles", lambda: _calc.to_moles(ox))
    t("p02_normalize", lambda: _calc.normalize(ox))
    apfu = _calc.to_apfu(ox, n_oxygens=12)
    t("p03_apfu", lambda: _calc.to_apfu(ox, n_oxygens=12))
    t("p04_droop_split", lambda: _calc.split_valence(
        apfu, "Fe", method="droop", n_oxygens=12, ideal_cations=8))
    t("p05_grt_endmembers", lambda: Grt.end_members(ox))
    t("p25_amp_endmembers", lambda: Amp.end_members(ox))
    oxf = ox.copy()
    oxf["Fe2O3"] = (oxf["Al2O3"] - 15.0) * 0.4 + 0.5
    t("p26_spl_endmembers", lambda: Spl.end_members(oxf))
    t("p20_tc_garnet", lambda: TC_g.end_members(ox))

    sl = oxf.head(20000)
    for name, fn in [("cipw_norm", _calc.cipw_norm),
                     ("cipw_norm_hb", _calc.cipw_norm_hb)]:
        t0 = time.time()
        fn(sl, normsum=True)
        dt = time.time() - t0
        print(f"REF {name} 20k rows: {dt:.2f}s -> extrapolated {n}: "
              f"{dt * n / 20000:.1f}s")


if __name__ == "__main__":
    main()
