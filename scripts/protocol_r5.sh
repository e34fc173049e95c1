#!/bin/bash
# Round-5 protocol diagnostics backfill (VERDICT r4 item #7): re-run every
# zoo row whose khat/frac>0.7/k-curve columns read "—" in
# docs/protocols.md, with `--khat --k-curve` on, and RETAIN the best
# checkpoints under saved_models/protocol_r5/ (gitignored, on-disk).
#
# Runs SOLO on the TPU, one process at a time. Data is synthetic for the
# image families (sealed environment), real for digits — same labeling as
# the table. model01 runs its full 1.4M-update reference protocol with the
# 50k eval cadence (the README ~2.5-minute configuration).
set -x
cd /root/repo
mkdir -p /tmp/protocol_logs saved_models/protocol_r5

CKPT=saved_models/protocol_r5

run() {
  name="$1"; log="$2"; shift 2
  timeout 5400 python -m vae_mdl_tpu.cli.run train "$name" \
    --steps-per-call 100 --device-dataset --no-resume --khat --k-curve \
    --checkpoint-dir "$CKPT" --log-dir /tmp/protocol_logs \
    "$@" > "/tmp/protocol_logs/${log}.log" 2>&1
  echo "== $log rc=$? =="
  grep -E "\\[eval\\]|\\[train\\]|k=" "/tmp/protocol_logs/${log}.log" | tail -6
}

run model01 model01 --eval-interval 50000
run model02 model02
run model03 model03
run model04 model04
run model04 model04_bound --bound-logstd --checkpoint-dir ${CKPT}_m04bound
run model06 model06
run ladder_svhn ladder_svhn
# biladder re-runs under the r5 split_merge=True default (new param tree;
# the retained r4 checkpoint needs split_merge=False to load)
run biladder_svhn biladder_svhn

# digits pair (real data): raw + EMA, disjoint-val checkpoint selection
timeout 3600 python -m vae_mdl_tpu.cli.run train digits \
  --steps-per-call 100 --device-dataset --no-resume --khat --k-curve \
  --checkpoint-dir ${CKPT}_digits_raw --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/digits_raw.log 2>&1
echo "== digits_raw rc=$? =="
grep -E "\\[eval\\]|\\[train\\]|k=" /tmp/protocol_logs/digits_raw.log | tail -6

timeout 3600 python -m vae_mdl_tpu.cli.run train digits --ema 0.999 \
  --steps-per-call 100 --device-dataset --no-resume --khat --k-curve \
  --checkpoint-dir ${CKPT}_digits_ema --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/digits_ema.log 2>&1
echo "== digits_ema rc=$? =="
grep -E "\\[eval\\]|\\[train\\]|k=" /tmp/protocol_logs/digits_ema.log | tail -6
