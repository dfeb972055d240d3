#!/bin/bash
# LoRA DreamBooth fine-tune, mirroring the reference train.sh (same flags,
# reference train.sh:1-14).  --device is accepted and ignored (JAX targets
# the TPU backend); booleans are flag-style (--use_lora / --no-use_lora).
python3 train_lora_dreambooth.py \
  --model_path ./weights/model/v1-5-pruned-emaonly.ckpt \
  --tokenizer_dir ./weights/tokenizer \
  --data_dir ./data/dreambooth \
  --img_size 512 \
  --batch_size 1 \
  --lr 1e-6 \
  --gradient_accumulation_steps 8 \
  --max_train_steps 1000 \
  --use_lora \
  --gradient_checkpointing
