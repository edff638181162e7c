from transit_tpu.numerics.simpson import (
    simpson_weights_np,
    simpson_weights_jnp,
    suffix_simpson_matrix_np,
    trapz_np,
)
from transit_tpu.numerics.spline import (
    spline_second_derivs_np,
    spline_eval_np,
    splinterp_np,
    spline_second_derivs_jnp,
    spline_eval_jnp,
    splinterp_jnp,
)
from transit_tpu.numerics.search import nearest_index_np, nearest_index_jnp
