#!/usr/bin/env bash
# reference: scripts/train_seed_x_sft_edit.sh — TPU-native launch of the
# second training entry point (image-edit SFT over the single-turn edit
# pipeline, configs/data/sft_edit.yaml). Same hyperparameters as the
# reference (lr 1e-4, wd 0.05, 20k steps, warmup 500, min_lr_ratio 0.05,
# save every 1000). Multi-host TPU pods launch one process per host
# (jax.distributed auto-initializes from the TPU environment); no torchrun.
set -e
PROJ=$(dirname "$0")/..
python -m seedx_tpu.train.train_sft \
  --image_transform "$PROJ/configs/processer/qwen_448_transform.yaml" \
  --tokenizer "$PROJ/configs/tokenizer/clm_llama_tokenizer_224loc_anyres.yaml" \
  --visual_encoder "$PROJ/configs/visual_encoder/qwen_vitg_448.yaml" \
  --agent_model "$PROJ/configs/clm_models/agent_seed_x.yaml" \
  --train_dataset "$PROJ/configs/data/sft_edit.yaml" \
  --output_dir runs/seed_x_sft_edit \
  --learning_rate 1e-4 --weight_decay 0.05 \
  --max_steps 20000 --warmup_steps 500 --min_lr_ratio 0.05 \
  --save_steps 1000 "$@"
