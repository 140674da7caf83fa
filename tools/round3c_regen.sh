#!/bin/bash
# Round-3c: regenerate all gitignored dataset binaries after the second
# VM reset (seeded generators reproduce bit-identically; tracked pkls
# verify). Runs on the single CPU core while the TPU trains.
set -u
cd /root/repo
LOG=/tmp/regen_data.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "x3 (960 scenes) start"
python tools/make_synthetic_3dmatch.py --root datasets/3dmatch_synthx3 \
    --train_scenes 960 --val_scenes 4 --test_scenes 8 --lo_overlap 0.10 0.05 \
    >> "$LOG" 2>&1
note "x3 rc=$?"
[ -f datasets/3dmatch_synthx3/data/train_cur_pairs-overlapmask.h5 ] && touch /tmp/x3_ready

note "modelnet start"
python tools/make_synthetic_modelnet.py >> "$LOG" 2>&1
note "modelnet rc=$?"
touch /tmp/modelnet_ready

note "mcd start"
python tools/make_synthetic_mcd.py >> "$LOG" 2>&1 \
  && python tools/mcd/pcd_to_samplepth.py --data_root datasets/mcd_synth >> "$LOG" 2>&1 \
  && python tools/mcd/create_mcd_pkl.py --data_root datasets/mcd_synth \
       --prefix mcd_synth --max_gap 4 >> "$LOG" 2>&1
note "mcd rc=$?"
touch /tmp/mcd_ready
note "regen done"
