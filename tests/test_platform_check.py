import jax
def test_platform():
    print("default_backend:", jax.default_backend())
    print("devices:", [d.platform for d in jax.devices()][:10])
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
