from gns_tpu.eval.newton_raphson import NRResult, newton_raphson_pf  # noqa: F401
from gns_tpu.eval.solve import solve_ac  # noqa: F401
from gns_tpu.eval.dcpf import solve_batched_dc  # noqa: F401
from gns_tpu.eval.fdpf import solve_batched_fdpf  # noqa: F401
