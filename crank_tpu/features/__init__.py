from crank_tpu.features.store import read_feature, write_features, feat2hdf5  # noqa: F401
from crank_tpu.features.scaler import StandardScaler, fit_scalers  # noqa: F401
from crank_tpu.features.extractor import FeatureExtractor  # noqa: F401
