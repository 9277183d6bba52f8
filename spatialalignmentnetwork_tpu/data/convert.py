"""NIfTI -> h5 volume conversion (data-prep step).

Equivalent of the reference convert_fastMRIDICOM.py:6-18: reorient to RAS
canonical, transpose to slice-major float32, store as an h5 `image` dataset
with `max` and `acquisition` attrs. Requires nibabel (host tool only).

Usage: python -m spatialalignmentnetwork_tpu.data.convert in.nii out.h5 T1
"""

import sys

import numpy as np
import h5py


def convert(nii_path, h5_path, protocal):
    import nibabel as nib

    nii = nib.load(nii_path)
    array = nib.as_closest_canonical(nii).get_fdata()  # convert to RAS
    array = array.T.astype(np.float32)
    with h5py.File(h5_path, "w") as h5:
        h5.create_dataset("image", data=array)
        h5.attrs["max"] = array.max()
        h5.attrs["acquisition"] = protocal


if __name__ == "__main__":
    convert(nii_path=sys.argv[1], h5_path=sys.argv[2], protocal=sys.argv[3])
