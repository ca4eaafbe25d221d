#!/bin/bash
# Three-scale verification capture with a TALLY GATE (r17 verdict #2:
# the committed r17 sf0.1 capture was truncated mid-stream at 150/180
# entries with no tally line, silently — whatever tee'd it lost the
# tail while the run itself passed). Each scale's capture is written
# whole, then REFUSED unless its final "N/N pass" tally is present and
# every per-query line says ok.
#
# Usage: tools/run_three_scale.sh <round>   e.g. tools/run_three_scale.sh 18
set -u
cd "$(dirname "$0")/.."
R="${1:?round number, e.g. 18}"
rc=0
for sf in 0.001 0.01 0.1; do
  case "$sf" in
    0.001) out="VERIFY_LOCAL_r${R}_sf0001.txt" ;;
    0.01)  out="VERIFY_LOCAL_r${R}.txt" ;;
    0.1)   out="VERIFY_LOCAL_r${R}_sf01.txt" ;;
  esac
  echo "=== sf${sf} -> ${out}"
  python tools/verify_local.py "/root/testdata/sf${sf}" 2>/dev/null \
    | grep -E '^(ok|FAIL|ERR|[0-9]+/[0-9]+ pass)' > "${out}"
  run_rc=${PIPESTATUS[0]}  # verify_local's code, not grep's
  # the gate: a capture without its tally line (or with a non-ok row,
  # or a tally that disagrees with the line count) is a FAILURE even
  # if the run itself exited 0 — an artifact must prove completeness
  tally=$(tail -1 "${out}")
  n_ok=$(grep -c '^ok ' "${out}")
  if [ "$run_rc" -ne 0 ]; then
    echo "REFUSED ${out}: verify run exited ${run_rc}"; rc=1
  elif ! echo "${tally}" | grep -qE '^[0-9]+/[0-9]+ pass$'; then
    echo "REFUSED ${out}: no final tally line (truncated capture)"; rc=1
  elif [ "${tally}" != "${n_ok}/${n_ok} pass" ]; then
    echo "REFUSED ${out}: tally '${tally}' != ${n_ok} ok lines"; rc=1
  else
    echo "OK ${out}: ${tally}"
  fi
done
exit $rc
