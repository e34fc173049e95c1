#!/bin/bash
# Re-run the two protocol_r5 rows lost to tunnel wedges (model01 at start,
# ladder_svhn at 40%).
set -x
cd /root/repo
CKPT=saved_models/protocol_r5

timeout 5400 python -m vae_mdl_tpu.cli.run train model01 \
  --steps-per-call 100 --device-dataset --no-resume --khat --k-curve \
  --eval-interval 50000 \
  --checkpoint-dir "$CKPT" --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/model01.log 2>&1
echo "== model01 rc=$? =="

timeout 5400 python -m vae_mdl_tpu.cli.run train ladder_svhn \
  --steps-per-call 100 --device-dataset --no-resume --khat --k-curve \
  --checkpoint-dir "$CKPT" --log-dir /tmp/protocol_logs \
  > /tmp/protocol_logs/ladder_svhn.log 2>&1
echo "== ladder_svhn rc=$? =="
