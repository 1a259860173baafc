#!/bin/sh
# Test gate runner: grouped pytest processes, parallel across cores.
#
# Why groups: this jaxlib's CPU backend segfaults when a single process
# accumulates roughly 30-40 fresh kernel compiles (see conftest.py), so one
# `pytest tests/` process crashes partway — but one process PER FILE (the r3
# workaround) recompiles the shared kernel zoo ~21 times (~1.5 h).  Grouping
# files that exercise the same kernel shapes into one process compiles each
# kernel once per group and stays under the crash threshold; groups run in
# parallel across cores.  If a group still dies on a signal (segfault), the
# runner degrades to one-process-per-file for that group — coverage is
# identical either way.
#
# Usage: sh tests/run_tests.sh [extra pytest args...]

set -u
PY=${PY:-python}
JOBS=${TESTJOBS:-$(nproc 2>/dev/null || echo 2)}
LOGDIR=$(mktemp -d /tmp/tpu_mpc_tests.XXXXXX)
EXTRA=${*:-}
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

# groups ordered slowest-first so the parallel schedule packs well.
# r5: test_gg20 split into sign/blame files and the adversarial matrix into
# n=2 / n>=5 quorum files (each former file sat at the compile-count crash
# threshold); keygen fixtures are disk-cached in tests/fixtures/ and the
# corruption matrices run as batched per-session scenarios, so the gate's
# former dominant costs (repeated keygens, one offline pass per scenario)
# are gone.
GROUPS_LIST="
gg20adv:test_gg20_adversarial.py
gg20q:test_gg20_adv_quorum.py
gg20q5:test_gg20_adv_quorum5.py
gg20q6:test_gg20_adv_quorum6.py
gg20q7:test_gg20_adv_quorum7.py
gg20:test_gg20.py,test_gg20_extra.py
gg20blame:test_gg20_blame.py
gg18:test_gg18.py,test_gg18_transport.py
zkcore:test_range_proofs.py,test_batch_verify.py
ec:test_ec.py,test_zk_vss.py
runtime:test_runtime.py,test_sharding.py,test_production_width.py
twoparty:test_lindell17.py,test_cclst.py,test_backup.py
paillier:test_paillier.py,test_pdl.py
kernels:test_bigint.py,test_montgomery.py,test_rns.py,test_bench_cache.py,test_fixtures.py,test_pallas.py,test_pallas_ec.py
"

run_one() {
  # $1 = test file path; rc 5 (only-deselected tests) counts as pass
  $PY -m pytest "$1" -x -q $EXTRA >"$LOGDIR/$(basename "$1").log" 2>&1
  rc=$?
  [ $rc -eq 5 ] && rc=0
  return $rc
}

run_group() {
  name=$1
  paths=$(echo "$2" | tr ',' ' ' | sed 's![^ ][^ ]*!tests/&!g')
  $PY -m pytest $paths -x -q $EXTRA >"$LOGDIR/$name.log" 2>&1
  rc=$?
  [ $rc -eq 5 ] && rc=0
  if [ $rc -gt 128 ]; then
    # crashed on a signal (accumulated-compile segfault): per-file fallback
    echo "group $name crashed (rc=$rc); retrying file-by-file" >&2
    for p in $paths; do
      run_one "$p" || {
        echo "FAIL $p"
        tail -60 "$LOGDIR/$(basename "$p").log"
        return 1
      }
    done
    echo "ok $name (per-file fallback)"
    return 0
  fi
  if [ $rc -ne 0 ]; then
    echo "FAIL group $name"
    tail -60 "$LOGDIR/$name.log"
    return 1
  fi
  echo "ok $name"
  return 0
}

pids=""
fail=0
active=0
for line in $GROUPS_LIST; do
  name=${line%%:*}
  files=${line#*:}
  run_group "$name" "$files" &
  pids="$pids $!"
  active=$((active + 1))
  if [ "$active" -ge "$JOBS" ]; then
    oldest=${pids# }
    oldest=${oldest%% *}
    wait "$oldest" || fail=1
    pids=$(echo "$pids" | sed "s/ *$oldest//")
    active=$((active - 1))
    [ $fail -ne 0 ] && break
  fi
done
for p in $pids; do
  wait "$p" || fail=1
done
if [ $fail -eq 0 ]; then
  echo "all test groups passed (logs: $LOGDIR)"
else
  echo "TEST GATE FAILED (logs: $LOGDIR)" >&2
fi
exit $fail
