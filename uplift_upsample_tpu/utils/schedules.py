"""Learning-rate schedules (optax-style: step → value).

Name and parameter registry matches the reference (`schedules.py:17-110`,
Keras schedule semantics) so SCHEDULE / SCHEDULE_PARAMS config entries work
unchanged:
  - ExponentialDecay(initial_learning_rate, decay_steps, decay_rate, staircase)
  - ExponentialDecayWithSteps: two-tier staircase — a small decay every
    `decay_steps` plus an extra large decay every `large_decay_steps`
    (the small-decay exponent is reduced by the large-decay count)
  - PiecewiseConstantDecay(boundaries, values)
  - CosineDecayRestarts(initial_learning_rate, first_decay_steps, t_mul, m_mul, alpha)
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_decay(initial_learning_rate, decay_steps, decay_rate, staircase=False,
                      name=None):
    def schedule(step):
        p = jnp.asarray(step, jnp.float32) / decay_steps
        if staircase:
            p = jnp.floor(p)
        return initial_learning_rate * jnp.power(decay_rate, p)
    return schedule


def exponential_decay_with_steps(initial_learning_rate, decay_steps, decay_rate,
                                 large_decay_steps, large_decay_rate, name=None):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        p = jnp.floor(step / decay_steps)
        large_p = jnp.floor(step / large_decay_steps)
        decayed = initial_learning_rate * jnp.power(decay_rate, p - large_p)
        return decayed * jnp.power(large_decay_rate, large_p)
    return schedule


def piecewise_constant_decay(boundaries, values, name=None):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        value = jnp.asarray(values[0], jnp.float32)
        for boundary, v in zip(boundaries, values[1:]):
            value = jnp.where(step > boundary, v, value)
        return value
    return schedule


def cosine_decay_restarts(initial_learning_rate, first_decay_steps, t_mul=2.0,
                          m_mul=1.0, alpha=0.0, name=None):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        completed = step / first_decay_steps
        if t_mul == 1.0:
            i_restart = jnp.floor(completed)
            frac = completed - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log1p(completed * (t_mul - 1.0)) / jnp.log(t_mul))
            sum_r = (jnp.power(t_mul, i_restart) - 1.0) / (t_mul - 1.0)
            frac = (completed - sum_r) / jnp.power(t_mul, i_restart)
        m_fac = jnp.power(m_mul, i_restart)
        cosine = 0.5 * m_fac * (1.0 + jnp.cos(jnp.pi * frac))
        return initial_learning_rate * ((1.0 - alpha) * cosine + alpha)
    return schedule


_REGISTRY = {
    "ExponentialDecay": exponential_decay,
    "ExponentialDecayWithSteps": exponential_decay_with_steps,
    "PiecewiseConstantDecay": piecewise_constant_decay,
    "CosineDecayRestarts": cosine_decay_restarts,
}


def scheduler_by_name(name):
    if name not in _REGISTRY:
        raise NotImplementedError(name)
    return _REGISTRY[name]
