"""Feature extraction helpers + on-disk feature database.

Parity: FD/reid/feature_extraction/ —
- extract_cnn_feature (cnn.py:9-27): single-batch eval features, optionally
  tapping multiple intermediate outputs.
- FeatureDatabase (database.py:8-51): h5py-backed fname → feature store.
"""

import h5py
import numpy as np


def extract_cnn_feature(extractor, imgs):
    """One uint8 batch → host features (cnn.py:9-27)."""
    out = extractor(np.asarray(imgs))
    return out[0] if isinstance(out, tuple) else out


class FeatureDatabase:
    """dict-like h5py store (database.py:8-51)."""

    def __init__(self, *args, **kwargs):
        self.fid = h5py.File(*args, **kwargs)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def __getitem__(self, keys):
        if isinstance(keys, (tuple, list)):
            return [self._get_single_item(k) for k in keys]
        return self._get_single_item(keys)

    def _get_single_item(self, key):
        return np.asarray(self.fid[key])

    def __setitem__(self, key, value):
        if key in self.fid:
            if self.fid[key].shape == value.shape and \
                    self.fid[key].dtype == value.dtype:
                self.fid[key][...] = value
            else:
                del self.fid[key]
                self.fid.create_dataset(key, data=value)
        else:
            self.fid.create_dataset(key, data=value)

    def __delitem__(self, key):
        del self.fid[key]

    def __len__(self):
        return len(self.fid)

    def __iter__(self):
        return iter(self.fid)

    def flush(self):
        self.fid.flush()

    def close(self):
        self.fid.close()
