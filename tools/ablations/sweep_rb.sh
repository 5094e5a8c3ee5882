set -e
for rb in 8 4 2 1; do
  WHISPER_TPU_DECODE_ROWS=$rb python tools/ablations/ablate_step.py full 2>&1 | grep -E "full:|Error|error" | sed "s/^full/rb=$rb/"
done
