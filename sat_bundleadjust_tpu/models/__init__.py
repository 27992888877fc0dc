from sat_bundleadjust_tpu.models.rpc import RPCModel
from sat_bundleadjust_tpu.models.cameras import SatelliteImage
