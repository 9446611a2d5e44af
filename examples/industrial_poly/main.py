"""Closed-loop robust polymerization batch (mirrors reference
examples/industrial_poly/main.py): maximize product mass m_P under
uncertain reaction enthalpy/rate while the adiabatic safety temperature
stays below its hard bound."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc
from template_simulator import template_simulator


def main():
    model = template_model()
    mpc = template_mpc(model)
    simulator = template_simulator(model)
    estimator = dm.estimator.StateFeedback(model)

    # reference main.py initial charge; T_adiab consistent with it
    delH_R_real, c_pR = 950.0, 5.0
    m_W, m_A, m_P, T_R = 10000.0, 853.0, 26.5, 90.0 + 273.15
    T_adiab = m_A * delH_R_real / ((m_W + m_A + m_P) * c_pR) + T_R
    x0 = np.array([m_W, m_A, m_P, T_R, 90.0 + 273.15, 90.0 + 273.15,
                   35.0 + 273.15, 35.0 + 273.15, 300.0, T_adiab])
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "5"))):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = np.asarray(estimator.make_step(y_next)).reshape(-1)
        print(f"k={k:2d}  m_dot_f={float(np.ravel(u0)[0]):9.2f}  "
              f"m_P={float(np.ravel(x0)[2]):8.2f}  T_R={float(np.ravel(x0)[3]):.2f} K")

    return mpc, simulator


if __name__ == "__main__":
    main()
