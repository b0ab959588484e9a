from .fit import (FitParams, fit, l2_loss, make_fit_step,
                  make_fit_step_pallas, make_sharded_fit_step,
                  make_sharded_fit_step_pallas)

__all__ = ["FitParams", "fit", "l2_loss", "make_fit_step",
           "make_fit_step_pallas", "make_sharded_fit_step",
           "make_sharded_fit_step_pallas"]
