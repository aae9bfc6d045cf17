"""Model tier: LunarisCoreVAE and LunarMoETeacher as pure param/apply fns."""

from lunaris_orion_tpu.models import vae, teacher  # noqa: F401
