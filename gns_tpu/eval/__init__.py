from gns_tpu.eval.newton_raphson import NRResult, newton_raphson_pf  # noqa: F401
from gns_tpu.eval.solve import solve_ac  # noqa: F401
