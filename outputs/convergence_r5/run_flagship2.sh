#!/bin/bash
# Round-5 flagship trajectory, relaunch (VERDICT r4 item 4).
#
# The first attempt (run_chain2.sh, outputs/convergence_r5/flagship_traj)
# was flat at chance after 3k steps — post-mortem: its cosine schedule used
# t_initial=3 (matched to the 3k-step budget), so the LR had decayed from
# 5e-4 to ~6e-5 by step 2500 and to ~1e-6 at the end; the 256-bit task is
# ~8x more bits and 4x more pixels than the 32-bit stage-A run that needed
# 5.6k steps AT FULL LR to reach 0.98 — the flagship got perhaps 1.5k
# effective full-LR steps. Relaunch: same identity-warm-start recipe
# (docs/training.md stage A, ref train.py:20-36 scale), STEPS steps with
# t_initial matched so the LR stays useful for the whole run.
set -e
cd /root/repo
R=outputs/convergence_r5
STEPS=${STEPS:-12000}
EPOCHS=$((STEPS / 1000))

echo "=== Flagship-scale trajectory v2 (256-bit, 256px, ${STEPS} steps) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 \
    --img_size 256 --synthetic 1 --steps $STEPS --batch_size 16 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=5e-4" \
    --scheduler "CosineLRScheduler,lr_min=5e-5,t_initial=$((EPOCHS + 2)),warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_identity.yaml \
    --eval_freq 1 --eval_augs identity --eval_samples 4 \
    --output_dir $R/flagship_traj2 >> $R/chain.log 2>&1
echo "=== flagship v2 done ===" | tee -a $R/chain.log
