#!/bin/sh
# Full-geometry conversion-parity matrix (tests/test_full_geometry.py).
#
# The heaviest fabrications (SDXL 2.6B UNet, OpenCLIP-H/bigG encoders) are
# skipped in default CI because they cost tens of minutes on a 1-core host;
# this script enables them.  Add DAAM_FULL_SPATIAL=1 to also run the real
# latent grids (64^2 SD2.1 / 128^2 SDXL) and a traced pipeline step at full
# SD2.1 geometry.
cd "$(dirname "$0")/.." || exit 1
DAAM_FULL_GEOMETRY=1 exec python -m pytest tests/test_full_geometry.py \
    tests/test_real_reference_full_geometry.py --full -v "$@"
