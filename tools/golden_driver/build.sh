#!/usr/bin/env bash
# Build the offline golden-data driver against the reference sources.
#
# Usage:   REF=/path/to/GEOSradiation_GridComp ./build.sh
# Needs:   gfortran >= 9 (or ifort: swap FC and drop the gfortran flags)
# Output:  ./golden_driver
#
# The k-coefficient data files are compiled -O1 exactly as the reference
# build does (rrtmg_sw/gcm_model/src/CMakeLists.txt:31-40) to keep
# compile times sane.
set -euo pipefail
REF=${REF:?set REF to the GEOSradiation_GridComp checkout}
HERE=$(cd "$(dirname "$0")" && pwd)
FC=${FC:-gfortran}
FFLAGS="-O2 -ffree-line-length-none -fno-range-check -I. -I$HERE"
FDATA="-O1 -fno-var-tracking -ffree-line-length-none -fno-range-check"
CPP="-cpp"

B=build_golden
mkdir -p $B && cd $B

compile() { echo "FC $1"; $FC $CPP $FFLAGS -c "$1"; }
compile_data() { echo "FC(data) $1"; $FC $CPP $FDATA -c "$1"; }

SHARED=$REF/GEOS_RadiationShared
LW=$REF/GEOSirrad_GridComp/RRTMG/rrtmg_lw/gcm_model
SW=$REF/GEOSsolar_GridComp/RRTMG/rrtmg_sw/gcm_model

# ---- stubs (MAPL/ESMF timers + macros only) -------------------------
cp "$HERE/MAPL_Generic.h" .
compile "$HERE/mapl_stub.F90"

# ---- shared radiation utilities -------------------------------------
compile_data "$SHARED/cloud_condensate_inhomogeneity.F90"
compile "$SHARED/cloud_subcol_gen.F90"
compile "$SHARED/radconstants.F90"
# gettau includes its .code files from its own directory
$FC $CPP $FFLAGS -I"$SHARED" -c "$SHARED/gettau.F90"

# ---- Chou kernels ---------------------------------------------------
compile_data "$REF/GEOSirrad_GridComp/irradconstants.F90"
compile "$REF/GEOSirrad_GridComp/irrad.F90"
compile_data "$REF/GEOSsolar_GridComp/soradconstants.F90"
compile "$REF/GEOSsolar_GridComp/sorad.F90"

# ---- RRTMG LW -------------------------------------------------------
for f in parrrtm rrlw_cld rrlw_con rrlw_ncpar rrlw_ref rrlw_tbl \
         rrlw_vsn rrlw_wvn; do compile "$LW/modules/$f.F90"; done
for i in 01 02 03 04 05 06 07 08 09 10 11 12 13 14 15 16; do
  compile "$LW/modules/rrlw_kg$i.F90"
  compile_data "$LW/src/rrtmg_lw_k_g_$i.F90"
done
for f in rrtmg_lw_setcoef rrtmg_lw_taumol rrtmg_lw_cldprmc \
         rrtmg_lw_rtrnmc rrtmg_lw_init rrtmg_lw_rad; do
  compile "$LW/src/$f.F90"
done

# ---- RRTMG SW -------------------------------------------------------
for f in parrrsw rrsw_aer rrsw_cld rrsw_con rrsw_ref rrsw_tbl \
         rrsw_vsn rrsw_wvn; do compile "$SW/modules/$f.F90"; done
for i in 16 17 18 19 20 21 22 23 24 25 26 27 28 29; do
  compile "$SW/modules/rrsw_kg$i.F90"
  compile_data "$SW/src/rrtmg_sw_k_g_$i.F90"
done
for f in NRLSSI2 rrtmg_sw_setcoef rrtmg_sw_taumol rrtmg_sw_cldprmc \
         rrtmg_sw_spcvmc rrtmg_sw_init rrtmg_sw_rad; do
  compile "$SW/src/$f.F90"
done

# ---- driver ---------------------------------------------------------
compile "$HERE/golden_driver.F90"
$FC $FFLAGS -o ../golden_driver ./*.o
cd ..
echo "built: ./golden_driver"
