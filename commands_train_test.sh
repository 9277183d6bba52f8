#!/bin/bash
# Staged experiment protocol for the TPU framework — the same 4-stage recipe
# as the reference (commands_train_test.sh:32-38):
#   1. Single-Modal   (reg None,     protocols "T2 None")
#   2. Multi-Modal    (reg None,     protocols "T2 T1", net_mask from stage 1)
#   3. GAN-Only       (reg GAN-Only, net_mask from stage 1)
#   4. Proposed       (reg Mixed,    net_{mask,D,G,T} from stage-3 best)
# followed by md5-cached test evaluation.

set -e

TRAIN="${TRAIN:-${PWD}/fastMRI_brain_DICOM/t1_t2_paired_6875_train.csv}"
VAL="${VAL:-${PWD}/fastMRI_brain_DICOM/t1_t2_paired_6875_val.csv}"
LOG_BASE="${LOG_BASE:-${PWD}/LOG}"
mkdir -p "${LOG_BASE}"
COILS=1
TGT=T2
REF=T1
FLAGS="${FLAGS:---prefetch --force_gpu}"

NAME="${NAME:-4xEquispaced}"
MASK="${MASK:-equispaced}"
SPAR="${SPAR:-0.25}"
# budget knobs (reference defaults; the parity-runner rehearsal shrinks
# them so the whole protocol smoke-runs in minutes)
EPOCH="${EPOCH:-20000}"
BATCH="${BATCH:-4}"
INTEL_STOP="${INTEL_STOP:-2e4}"

COMMON="--train ${TRAIN} --val ${VAL} --num_workers 8 --lr 1e-4 \
 --smooth_weight 1000 --gan_weight 0.1 --gan_sim_weight 1 --sim_weight 1 \
 --mask ${MASK} --aux_aug PBSpline --sparsity ${SPAR} --epoch ${EPOCH} \
 --batch_size ${BATCH} --intel_stop ${INTEL_STOP} --coils ${COILS} ${FLAGS}"

# SKIP_EXISTING=1 (set by scripts/run_reference_parity.sh) makes each train
# stage idempotent: a finished stage (best.pt present) is not re-trained, so
# an interrupted protocol resumes at the failed stage on re-run.
SKIP_EXISTING="${SKIP_EXISTING:-0}"
function run_train(){
  local logdir="$1"; shift
  if [ "${SKIP_EXISTING}" = "1" ] && [ -e "${logdir}/ckpt/best.pt" ]; then
    echo "SKIP train ${logdir} (best.pt exists)"
  else
    python3 "$(dirname "$0")/train.py" --logdir "${logdir}" "$@" ${COMMON}
  fi
}

# Single-Modal
run_train ${LOG_BASE}/None_${NAME}${TGT}_PBSplineNone \
  --protocals ${TGT} None --reg None
# Multi-Modal
run_train ${LOG_BASE}/${REF}_${NAME}${TGT}_PBSplineNone \
  --protocals ${TGT} ${REF} --reg None \
  --resume ${LOG_BASE}/None_${NAME}${TGT}_PBSplineNone/ckpt/best.pt \
  --load_nets net_mask
# GAN-Only pretrain
run_train ${LOG_BASE}/${REF}_${NAME}${TGT}_PBSplineGANOnly \
  --protocals ${TGT} ${REF} --reg GAN-Only \
  --resume ${LOG_BASE}/None_${NAME}${TGT}_PBSplineNone/ckpt/best.pt \
  --load_nets net_mask
# Proposed
run_train ${LOG_BASE}/${REF}_${NAME}${TGT}_PBSplineProposed \
  --protocals ${TGT} ${REF} --reg Mixed \
  --resume ${LOG_BASE}/${REF}_${NAME}${TGT}_PBSplineGANOnly/ckpt/best.pt \
  --load_nets net_mask net_D net_G net_T

# Testing
EVAL_BASE="${EVAL_BASE:-${PWD}/eval}"
DATA_TEST="${DATA_TEST:-${PWD}/fastMRI_brain_DICOM/t1_t2_paired_6875_test.csv}"
AUX_AUG='-1'
EVAL_FLAGS="${EVAL_FLAGS:-}"

function run_test(){
  echo ${ENAME}
  mkdir -p ${EVAL_BASE}/${ENAME}
  if test -f ${EVAL_BASE}/${ENAME}/md5sum && md5sum -c ${EVAL_BASE}/${ENAME}/md5sum
  then
    echo SKIPPED
  else
    python3 "$(dirname "$0")/eval.py" \
      --resume ${LOG_BASE}/${ENAME}/ckpt/best.pt \
      --val ${DATA_TEST} \
      --protocals ${PROTOCALS} --aux_aug ${AUX_AUG} \
      --save ${EVAL_BASE}/${ENAME} \
      --metric ${EVAL_BASE}/${ENAME}.json ${EVAL_FLAGS}
    md5sum ${LOG_BASE}/${ENAME}/ckpt/best.pt/* > ${EVAL_BASE}/${ENAME}/md5sum
  fi
}

PROTOCALS="${TGT} None"
ENAME="None_${NAME}${TGT}_PBSplineNone"; run_test
PROTOCALS="${TGT} ${REF}"
ENAME="${REF}_${NAME}${TGT}_PBSplineNone"; run_test
ENAME="${REF}_${NAME}${TGT}_PBSplineProposed"; run_test
