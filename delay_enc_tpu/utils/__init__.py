from .jaxcfg import configure_jax
