import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import importlib.util
spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m.dryrun_multichip(8)
fn, args = m.entry()
out = jax.jit(fn)(*args)
print("entry ok:", out.shape)
