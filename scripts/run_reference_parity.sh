#!/bin/bash
# Turnkey real-data parity runner: one command from a raw `brain_nii/` root
# to a reference-vs-ours verdict.
#
#   scripts/run_reference_parity.sh <brain_nii_root> [workdir]
#
# Pipeline (each stage idempotent — a re-run resumes where it stopped):
#   0. convert   NIfTI -> h5 volumes + pairs manifest
#                (<root>/T1/*.nii[.gz], <root>/T2/*.nii[.gz]; skipped when
#                the root is already converted: <root>/h5 + split CSVs)
#   1. split     deterministic by-volume train/val/test manifests
#   2. protocol  the reference's 4-stage recipe + md5-cached test eval
#                (commands_train_test.sh — the same script, same flags;
#                reference commands_train_test.sh:32-62)
#   3. compare   per-experiment PSNR tolerance vs the reference's metric
#                JSONs when provided (<root>/reference_metrics/<ENAME>.json)
#
# Knobs (env): EPOCH BATCH INTEL_STOP FLAGS EVAL_FLAGS MASK SPAR NAME
#              TOL_DB SPLIT_SEED — reference-recipe defaults; the rehearsal
#              test shrinks them to smoke scale.
#
# Exit status: 0 = every available comparison PASSed (or no reference
# metrics were provided — then it prints where to drop them); nonzero on
# any stage failure or tolerance FAIL.

set -euo pipefail

ROOT="${1:?usage: run_reference_parity.sh <brain_nii_root> [workdir]}"
WORK="${2:-${ROOT}/parity_work}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PY="${PYTHON:-python3}"

TGT="${TGT:-T2}"
REFP="${REFP:-T1}"
NAME="${NAME:-4xEquispaced}"
TOL_DB="${TOL_DB:-0.1}"
SPLIT_SEED="${SPLIT_SEED:-0}"

mkdir -p "${WORK}"
H5_DIR="${WORK}/h5"

# ---- stage 0: convert ------------------------------------------------------
if [ -f "${H5_DIR}/pairs.csv" ]; then
  echo "[parity] stage 0 convert: SKIP (found ${H5_DIR}/pairs.csv)"
elif [ -d "${ROOT}/${REFP}" ] && [ -d "${ROOT}/${TGT}" ]; then
  echo "[parity] stage 0 convert: ${ROOT}/{${REFP},${TGT}} -> ${H5_DIR}"
  "${PY}" -m spatialalignmentnetwork_tpu.data.convert \
    --batch "${ROOT}/${REFP}" "${ROOT}/${TGT}" \
    --protocals "${REFP}" "${TGT}" \
    --out "${H5_DIR}" --manifest pairs.csv
else
  echo "[parity] ERROR: ${ROOT} has neither converted h5 (${H5_DIR}/pairs.csv)" >&2
  echo "         nor NIfTI dirs (${ROOT}/${REFP}, ${ROOT}/${TGT})" >&2
  exit 2
fi

# ---- stage 1: split --------------------------------------------------------
TRAIN_CSV="${H5_DIR}/paired_train.csv"
if [ -f "${TRAIN_CSV}" ]; then
  echo "[parity] stage 1 split: SKIP (found ${TRAIN_CSV})"
else
  "${PY}" "${REPO}/scripts/make_split_manifests.py" \
    "${H5_DIR}/pairs.csv" "${H5_DIR}" --seed "${SPLIT_SEED}"
fi

# ---- stage 2: staged protocol + md5-cached eval ----------------------------
echo "[parity] stage 2 protocol: 4-stage train + eval (LOG ${WORK}/LOG)"
# manifests hold bare h5 filenames; the datasets resolve them relative to
# the CSV's own directory (data/paired_dataset.py:161), so no cwd games
env \
  TRAIN="${TRAIN_CSV}" \
  VAL="${H5_DIR}/paired_val.csv" \
  DATA_TEST="${H5_DIR}/paired_test.csv" \
  LOG_BASE="${WORK}/LOG" \
  EVAL_BASE="${WORK}/eval" \
  SKIP_EXISTING=1 \
  NAME="${NAME}" TGT="${TGT}" REF="${REFP}" \
  bash "${REPO}/commands_train_test.sh"

# ---- stage 3: tolerance compare vs the reference ---------------------------
REF_METRICS="${ROOT}/reference_metrics"
ENAMES=(
  "None_${NAME}${TGT}_PBSplineNone"
  "${REFP}_${NAME}${TGT}_PBSplineNone"
  "${REFP}_${NAME}${TGT}_PBSplineProposed"
)
REPORT="${WORK}/parity_report.txt"
: > "${REPORT}"
fail=0
compared=0
for ENAME in "${ENAMES[@]}"; do
  ours="${WORK}/eval/${ENAME}.json"
  theirs="${REF_METRICS}/${ENAME}.json"
  if [ ! -f "${theirs}" ]; then
    echo "[parity] ${ENAME}: no reference metrics at ${theirs} — skipped" \
      | tee -a "${REPORT}"
    continue
  fi
  compared=$((compared + 1))
  if "${PY}" "${REPO}/scripts/compare_metrics.py" \
       "${ours}" "${theirs}" --tol_db "${TOL_DB}" | tee -a "${REPORT}"; then
    echo "[parity] ${ENAME}: PASS (|dPSNR| <= ${TOL_DB} dB)" | tee -a "${REPORT}"
  else
    echo "[parity] ${ENAME}: FAIL" | tee -a "${REPORT}"
    fail=1
  fi
done

if [ "${compared}" -eq 0 ]; then
  echo "[parity] no reference metrics found under ${REF_METRICS}/." \
    | tee -a "${REPORT}"
  echo "         To complete the comparison, run the reference's" \
    | tee -a "${REPORT}"
  echo "         commands_train_test.sh on the same split and drop its" \
    | tee -a "${REPORT}"
  echo "         eval/<ENAME>.json files there, then re-run this script" \
    | tee -a "${REPORT}"
  echo "         (training results are cached; only stage 3 re-runs)." \
    | tee -a "${REPORT}"
fi
echo "[parity] report: ${REPORT}"
exit "${fail}"
