"""Balance of plant: fusion power -> grid electricity, with parasitic loads.

Role-parity with the reference's ``engineering/balance_of_plant.py:44-120``
(``PowerPlantModel.calculate_plant_performance``) and
``engineering/thermal_hydraulics.py:38-120`` (Churchill friction factor +
coolant-loop pumping power), redesigned functionally: a frozen
:class:`PlantParams`, pure ``jnp`` functions, and every quantity traceable —
so whole operating-point scans (P_fusion x P_aux grids) run under ``vmap``
on device instead of Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

# coolant: (density kg/m3, cp J/kgK, viscosity Pa s, dT_loop K)
_COOLANTS = {
    "water": (720.0, 5500.0, 9.0e-5, 40.0),     # PWR-like, 15 MPa
    "helium": (5.0, 5190.0, 4.0e-5, 300.0),     # 8 MPa HTGR-like
    "flibe": (1940.0, 2415.0, 6.0e-3, 100.0),
}


@dataclasses.dataclass(frozen=True)
class PlantParams:
    coolant: str = "water"
    eta_thermal: float = 0.35       # Rankine
    eta_heating: float = 0.40       # wall-plug efficiency of NBI/ECRH
    p_cryo_mw: float = 30.0
    p_misc_mw: float = 15.0
    blanket_multiplication: float = 1.15
    neutron_fraction: float = 0.8   # D-T: 14.1 MeV n of 17.6 MeV
    pipe_diameter_m: float = 0.4
    pipe_length_m: float = 200.0
    flow_velocity_m_s: float = 8.0
    pump_efficiency: float = 0.85

    def __post_init__(self):
        if self.coolant not in _COOLANTS:
            raise ValueError(f"unknown coolant {self.coolant!r}; "
                             f"known: {sorted(_COOLANTS)}")
        if not 0.0 < self.eta_thermal < 1.0:
            raise ValueError("eta_thermal must be in (0, 1)")


class PlantPerformance(NamedTuple):
    p_fusion_mw: jnp.ndarray
    p_thermal_mw: jnp.ndarray
    p_gross_mw: jnp.ndarray
    p_recirc_mw: jnp.ndarray
    p_net_mw: jnp.ndarray
    q_plasma: jnp.ndarray
    q_engineering: jnp.ndarray
    p_pump_mw: jnp.ndarray
    p_heating_plug_mw: jnp.ndarray


def churchill_friction_factor(reynolds, roughness_ratio: float = 1e-4):
    """Churchill (1977) all-regime Darcy friction factor (traceable;
    reference ``thermal_hydraulics.py:38``)."""
    re = jnp.maximum(reynolds, 1.0)
    a = (2.457 * jnp.log(1.0 / ((7.0 / re) ** 0.9
                                + 0.27 * roughness_ratio))) ** 16
    b = (37530.0 / re) ** 16
    return 8.0 * ((8.0 / re) ** 12 + 1.0 / (a + b) ** 1.5) ** (1.0 / 12.0)


def pumping_power(p_thermal_mw, params: PlantParams):
    """Coolant pumping power from loop hydraulics.

    Mass flow from the thermal duty (m = P / (cp dT)); pressure drop from
    Darcy-Weisbach over the loop length at the design flow velocity.
    """
    rho, cp, mu, dt_loop = _COOLANTS[params.coolant]
    p_w = p_thermal_mw * 1e6
    mdot = p_w / (cp * dt_loop)                      # kg/s
    v = params.flow_velocity_m_s
    d = params.pipe_diameter_m
    # Flow area implied by continuity; parallel pipes scale linearly, so the
    # per-unit pressure drop uses the single-pipe Reynolds number.
    re = rho * v * d / mu
    f = churchill_friction_factor(re)
    dp = f * (params.pipe_length_m / d) * 0.5 * rho * v * v   # Pa
    p_pump_w = mdot * dp / (rho * params.pump_efficiency)
    return p_pump_w / 1e6


class CoolantLoop:
    """Thin stateful facade (reference ``CoolantLoop`` API shape)."""

    def __init__(self, coolant_type: str = "water"):
        self.params = PlantParams(coolant=coolant_type)

    def calculate_pumping_power(self, p_thermal_mw: float) -> dict:
        p = float(pumping_power(jnp.asarray(p_thermal_mw), self.params))
        rho, cp, mu, dt_loop = _COOLANTS[self.params.coolant]
        return {"P_pump_MW": p,
                "mdot_kg_s": p_thermal_mw * 1e6 / (cp * dt_loop)}


def plant_performance(p_fusion_mw, p_aux_absorbed_mw,
                      params: PlantParams = PlantParams()
                      ) -> PlantPerformance:
    """Fusion power -> net electricity (reference
    ``calculate_plant_performance`` :64-120 semantics, traceable)."""
    p_fus = jnp.asarray(p_fusion_mw, jnp.float32)
    p_aux = jnp.asarray(p_aux_absorbed_mw, jnp.float32)

    p_neutron = params.neutron_fraction * p_fus
    p_alpha = (1.0 - params.neutron_fraction) * p_fus
    p_thermal = (p_neutron * params.blanket_multiplication
                 + p_alpha + p_aux)
    p_gross = p_thermal * params.eta_thermal

    p_pump = pumping_power(p_thermal, params)
    p_plug = p_aux / params.eta_heating
    p_recirc = params.p_cryo_mw + params.p_misc_mw + p_pump + p_plug
    p_net = p_gross - p_recirc

    q_plasma = jnp.where(p_aux > 0, p_fus / jnp.maximum(p_aux, 1e-9), 0.0)
    q_eng = jnp.where(p_recirc > 0,
                      p_gross / jnp.maximum(p_recirc, 1e-9), 0.0)
    return PlantPerformance(
        p_fusion_mw=p_fus, p_thermal_mw=p_thermal, p_gross_mw=p_gross,
        p_recirc_mw=p_recirc, p_net_mw=p_net, q_plasma=q_plasma,
        q_engineering=q_eng, p_pump_mw=p_pump, p_heating_plug_mw=p_plug)
