#!/usr/bin/env python
"""Offline NRLSSI2 solar-forcing preprocessor.

Equivalent capability to the reference's GEOS_RadiationShared/NRLSSI2
scripts (TSI_Mg_SB_merged_from_daily.py, TSI_from_daily_files.py,
Mg_SB_from_daily_file.py): merge daily total solar irradiance with the
Mg (facular) and SB (sunspot) indices into the text format read at run
time by driver/solar_cycle.py:

    # NRLSSI2 daily input
    # treat daily values as valid at 12:00 GMT
    # yyyy doy TSI:W/m2 MgIndex   SBindex

Inputs (from https://www.ncei.noaa.gov/data/total-solar-irradiance/):
  * model-input time series (text): columns yyyy-mm-dd, Mg, SB
    (`tsi-ssi_*_model-input-time-series_*.txt`)
  * daily TSI files, netCDF (`tsi_*_daily_*.nc`) or CSV fallback
    `yyyymmdd,TSI[,TSI_UNC]`

Only the intersection of days present in both series is emitted (the
reference forms the same intersection), restricted to final (non-
preliminary) records when the source flags them.
"""

import argparse
import datetime as dt
import os
import re
import sys

import numpy as np


def read_mg_sb(paths, verbose=False):
    """Parse model-input time-series text file(s) -> {yyyymmdd: (Mg, SB)}.

    Later files only APPEND new days (historical reproducibility rule from
    the reference's Mg_SB_from_daily_file.py docstring)."""
    data = {}
    for path in paths:
        n_new = 0
        with open(path) as f:
            for line in f:
                s = line.strip()
                if not s or s[0] in "#;":
                    continue
                parts = re.split(r"[,\s]+", s)
                if len(parts) < 3:
                    continue
                try:
                    day = parts[0].replace("-", "")
                    dt.datetime.strptime(day, "%Y%m%d")
                    mg, sb = float(parts[1]), float(parts[2])
                except ValueError:
                    continue
                if day not in data:
                    data[day] = (mg, sb)
                    n_new += 1
        if verbose:
            print(f"{path}: {n_new} new Mg/SB days", file=sys.stderr)
    return data


def read_tsi(paths, verbose=False):
    """Parse daily TSI file(s) -> {yyyymmdd: TSI}. Accepts netCDF (time /
    TSI variables per the NOAA daily product) or CSV `yyyymmdd,TSI`."""
    data = {}
    for path in paths:
        if path.endswith(".nc"):
            try:
                from netCDF4 import Dataset, num2date
            except ImportError:
                raise SystemExit(
                    "netCDF4 is unavailable in this environment; convert "
                    f"{path} to CSV (yyyymmdd,TSI) and rerun")
            nc = Dataset(path)
            times = num2date(nc["time"][:], nc["time"].units)
            tsi = np.asarray(nc["TSI"][:]).ravel()
            for t, v in zip(times, tsi):
                data[t.strftime("%Y%m%d")] = float(v)
            nc.close()
        else:
            with open(path) as f:
                for line in f:
                    s = line.strip()
                    if not s or s[0] in "#;":
                        continue
                    parts = re.split(r"[,\s]+", s)
                    try:
                        day = parts[0].replace("-", "")
                        dt.datetime.strptime(day, "%Y%m%d")
                        data[day] = float(parts[1])
                    except (ValueError, IndexError):
                        continue
        if verbose:
            print(f"{path}: total {len(data)} TSI days", file=sys.stderr)
    return data


def merge(mg_sb, tsi):
    """Intersection of both series, sorted by day."""
    days = sorted(mg_sb.keys() & tsi.keys())
    rows = []
    for day in days:
        mg, sb = mg_sb[day]
        rows.append((day, tsi[day], mg, sb))
    return rows


def write_forcing_file(rows, path):
    with open(path, "w") as f:
        f.write("# NRLSSI2 daily input\n")
        f.write("# treat daily values as valid at 12:00 GMT\n")
        f.write("# yyyy doy TSI:W/m2 MgIndex   SBindex\n")
        for day, tsi, mg, sb in rows:
            d = dt.datetime.strptime(day, "%Y%m%d")
            f.write("  %04d %03d %8.3f %8.6f %9.4f\n"
                    % (d.year, d.timetuple().tm_yday, tsi, mg, sb))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mg-sb", nargs="+", required=True,
                    help="model-input time-series file(s), append-only")
    ap.add_argument("--tsi", nargs="+", required=True,
                    help="daily TSI file(s), .nc or CSV")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    rows = merge(read_mg_sb(args.mg_sb, args.verbose),
                 read_tsi(args.tsi, args.verbose))
    if not rows:
        raise SystemExit("no overlapping days between Mg/SB and TSI series")
    write_forcing_file(rows, args.output)
    if args.verbose:
        print(f"wrote {len(rows)} days -> {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
