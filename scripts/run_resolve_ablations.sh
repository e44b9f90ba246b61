#!/bin/sh
# Run every resolve ablation variant, one fresh process each (kernel
# code paths are module-scope switches). ~1-2 min compile per variant.
cd /root/repo || exit 1
for v in full noshade nofetch nomin halftiles constmat; do
  timeout 1200 python scripts/ablate_resolve.py "$v" "${1:-1024}"
done
# FORCE_TILES removes the per-tile any-hit conds (slab tests then DCE out)
PT_TPU_FORCE_TILES=1 timeout 1200 python scripts/ablate_resolve.py full "${1:-1024}" | sed 's/^full/forcetiles/'
