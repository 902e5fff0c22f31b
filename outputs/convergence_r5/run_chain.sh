#!/bin/bash
# Round-5 convergence chain (VERDICT r4 items 3+4):
#   C1c  — concentrated hard-geometric pool (augs_geometric_hard.yaml),
#          resumes the r4 C1b checkpoint (26k steps of warm-up)
#   C2   — polish: full pool + yuv perceptual + discriminator, scaling_w
#          annealed 1.0 -> 0.6 to recover psnr >= 38 (docs/training.md C2)
#   sweep — tools/eval_checkpoint -> metrics.csv (the final artifact)
#   flagship_traj — 256-bit / 256 px few-k-step trajectory at the real
#          model scale (de-risks the 601k-step recipe, ref train.py:20-36)
set -e
cd /root/repo
R=outputs/convergence_r5
R4=outputs/convergence_r4
mkdir -p $R

echo "=== Stage C1c: concentrated hard-geometric pool ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 30000 --batch_size 32 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=2e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=30,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_geometric_hard.yaml \
    --resume $R4/stageC1b/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC1c >> $R/chain.log 2>&1

echo "=== Stage C2: polish (full pool + disc + perceptual) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 14000 --batch_size 32 \
    --num_augs 2 --lambda_d 0.1 --lambda_i 0.1 --perceptual_loss yuv \
    --disc_start 10000 --scaling_w 1.0 \
    --scaling_w_schedule "Cosine,scaling_min=0.6,start_epoch=2,epochs=10" \
    --optimizer "AdamW,lr=1e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=100,warmup_t=2" \
    --augmentation_config videoseal_tpu/configs/augs_geometric.yaml \
    --resume $R/stageC1c/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC2 >> $R/chain.log 2>&1

echo "=== Final robustness sweep (C2) ===" | tee -a $R/chain.log
python -m videoseal_tpu.tools.eval_checkpoint \
    --checkpoint $R/stageC2/checkpoint.npz \
    --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 1.0 \
    --samples 8 --out_csv $R/stageC2/metrics.csv >> $R/chain.log 2>&1

echo "=== Flagship-scale trajectory (256-bit, 256px) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 \
    --img_size 256 --synthetic 1 --steps 3000 --batch_size 16 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=5e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=3,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_identity.yaml \
    --eval_freq 1 --eval_augs identity --eval_samples 4 \
    --output_dir $R/flagship_traj >> $R/chain.log 2>&1
echo "=== round-5 chain done ===" | tee -a $R/chain.log
