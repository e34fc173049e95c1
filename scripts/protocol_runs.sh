#!/bin/bash
# Full reference-length protocol runs for the zoo entries that lacked them
# (VERDICT r2 next-round #3): model02/03/04/06 + both SVHN ladders, plus the
# digits EMA pair regenerated on the new disjoint val split.
#
# Runs SOLO on the TPU, one process at a time. Data is synthetic (no
# MNIST/SVHN files exist in this sealed image) — numbers are labeled as
# such; the point is full-protocol exercise: staircase schedule,
# eval/checkpoint cadence, best-reload, 5000-IS final eval, asset grids.
#
# --device-dataset keeps the whole (synthetic) train split in HBM;
# --steps-per-call 100 amortises the ~2ms tunnel dispatch.
set -x
cd /root/repo
mkdir -p /tmp/protocol_logs

run() {
  name="$1"; shift
  timeout 5400 python -m vae_mdl_tpu.cli.run train "$name" \
    --steps-per-call 100 --device-dataset --no-resume \
    --checkpoint-dir "/tmp/protocol_ckpts" --log-dir "/tmp/protocol_logs" \
    "$@" > "/tmp/protocol_logs/${name}.log" 2>&1
  echo "== $name rc=$? =="
  tail -3 "/tmp/protocol_logs/${name}.log"
}

run model02
run model03
run model04
run model06
run ladder_svhn
run biladder_svhn

# digits EMA comparison on the new disjoint split (design.md §7b regen);
# real data, host pipeline (tiny set), reference-style cadence
timeout 3600 python -m vae_mdl_tpu.cli.run train digits \
  --steps-per-call 100 --device-dataset --no-resume \
  --checkpoint-dir /tmp/protocol_ckpts_digits_raw --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/digits_raw.log 2>&1
echo "== digits raw rc=$? =="; tail -3 /tmp/protocol_logs/digits_raw.log

timeout 3600 python -m vae_mdl_tpu.cli.run train digits --ema 0.999 \
  --steps-per-call 100 --device-dataset --no-resume \
  --checkpoint-dir /tmp/protocol_ckpts_digits_ema --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/digits_ema.log 2>&1
echo "== digits ema rc=$? =="; tail -3 /tmp/protocol_logs/digits_ema.log
