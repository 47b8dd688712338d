#!/bin/bash
# Usage: tools/dump_plan.sh <sf> <query> <outfile>
# Runs PlanAudit for one query and writes the clean formatted plan.
set -e
sf=$1; q=$2; out=$3
sbt "runMain graft.PlanAudit $sf $q" 2>/dev/null \
  | sed -n "/======== $q ========/,\$p" \
  | sed 's/^\[info\] //' | grep -v '^\[success\]' > "$out"
wc -l "$out"
