#!/usr/bin/env bash
# End-to-end demo (reference: demo/run.sh): boot the relay, run n keygen
# clients, then t+1 sign clients, print the signature.
#
# Usage: demo/run.sh [gg20|gg18]   (default gg20)
#
# Uses the CPU backend and a reduced Paillier width so the demo finishes in
# a few minutes; production runs use 2048-bit keys on TPU.
set -euo pipefail
cd "$(dirname "$0")/.."

PROTO="${1:-gg20}"
export JAX_PLATFORMS=cpu
BITS="${DEMO_PAILLIER_BITS:-768}"
T=1; N=3
WORKDIR="$(mktemp -d)"
trap 'kill 0 2>/dev/null || true; rm -rf "$WORKDIR"' EXIT
PIDS=()

if [ "$PROTO" = "gg20" ]; then
  python -m tpu_mpc.runtime.relay_server --port 18600 & sleep 1
  ADDR=http://127.0.0.1:18600
  for i in 1 2 3; do
    python -m tpu_mpc.runtime.cli keygen -a "$ADDR" -r demo-keygen \
      -i "$i" -t $T -n $N --paillier-bits "$BITS" \
      -o "$WORKDIR/local$i.json" & PIDS+=($!)
  done
  wait "${PIDS[@]}"; PIDS=()
  echo "keygen done: $WORKDIR/local{1,2,3}.json"
  for i in 1 2; do
    python -m tpu_mpc.runtime.cli sign -a "$ADDR" -r demo-sign -p 1,2 \
      -d "hello tpu-mpc" -l "$WORKDIR/local$i.json" & PIDS+=($!)
  done
  wait "${PIDS[@]}"
elif [ "$PROTO" = "gg18" ]; then
  echo "{\"parties\": \"$N\", \"threshold\": \"$T\"}" > "$WORKDIR/params.json"
  python -m tpu_mpc.runtime.kv_server --port 18601 --params "$WORKDIR/params.json" & sleep 1
  ADDR=http://127.0.0.1:18601
  for i in 1 2 3; do
    python -m tpu_mpc.runtime.gg18_keygen_client --address "$ADDR" \
      --params "$WORKDIR/params.json" --paillier-bits "$BITS" \
      --output "$WORKDIR/keys$i.store" & PIDS+=($!)
  done
  wait "${PIDS[@]}"; PIDS=()
  echo "keygen done: $WORKDIR/keys{1,2,3}.store"
  for i in 1 2; do
    python -m tpu_mpc.runtime.gg18_sign_client --address "$ADDR" \
      --local-share "$WORKDIR/keys$i.store" --data-to-sign "hello tpu-mpc" & PIDS+=($!)
  done
  wait "${PIDS[@]}"
else
  echo "unknown protocol: $PROTO (use gg20 or gg18)" >&2; exit 1
fi
echo "demo ($PROTO) complete"
