"""raytracetorch_tpu — a TPU-native differentiable optical ray tracer.

A from-scratch JAX/XLA re-design with the capabilities of
myamakaitis/RayTraceTorch (see SURVEY.md for the reference blueprint and
PARITY.md for documented behavioral divergences).
"""

from .constants import GeomKind, PhysKind, SBKind, VBKind
from .core.sensor import SensorConfig, SensorState
from .core.table import SurfaceRec, SurfaceTable
from .core.trace import trace_nonsequential, trace_sequential
from .elements.aperture import (CircularAperture, ComponentFuzzy,
                                EllipticAperture, FuzzyAperture,
                                ObscuredAperture, RectangularAperture)
from .elements.base import Element, ElementCustom
from .elements.ideal import (DiffractionGrating, IdealCylThinLens,
                             IdealMirror, IdealThinLens,
                             LinearElement, paraxial_dist_mat,
                             paraxial_lens_mat, paraxial_mirror_mat,
                             paraxial_refract_mat)
from .elements.lens import (AsphericLens, CylSingletLens, DoubletLens, FreeformLens,
                            SingletLens, TripletLens, WedgePrism, ZernikeLens)
from .elements.mirror import (AsphericMirror, ConicMirror,
                              CylindricalMirror, ManginMirror,
                              ParabolicMirror, ParabolicMirrorOffAxis,
                              ParabolicMirrorXZ, SphericalMirror)
from .elements.diffractive import DiffractiveLens, PhaseGridPlate
from .elements.grin import GrinRod
from .elements.mla import MicrolensArray
from .elements.polarization import (HalfWaveplate, LinearPolarizer,
                                    QuarterWaveplate, Waveplate)
from .elements.scatter import Diffuser, LambertianScatterer, RoughMirror
from .elements.sensor import SensorElement
from .elements.solids import (Box4SideElement, BoxElement,
                              CvxPolyhedronElement)
from .geom.transform import Frame, rodrigues
from .rays.ray import Rays
from .rays.sources import (Bundle, CollimatedDisk, CollimatedLine, Fan,
                           GaussianBeam, LambertianEmission, LambertianSphere,
                           MieScatter, PointSource, RayleighScatter,
                           RectangularPanel, RingSource, SolidAngleEmission,
                           sample_bundles)
from .optim.constraints import (spacing_constraint, system_length_constraint,
                                thickness_constraint)
from .optim.fit import fit, fit_lbfgs, fit_lm
from .optim.goals import focal_length_loss, spot_size_loss, spot_target_loss
from .optim.merit import default_merit, opd_residuals, spot_residuals
from .optim.multiconfig import (config_params, config_sweep,
                                multiconfig_loss, stack_configs)
from .optim.wave_goals import (wave_encircled_energy, wave_encircled_loss,
                               wave_peak_loss)
from .project import (load_checkpoint, load_params, load_project,
                      load_scene, save_checkpoint, save_params,
                      save_project)
from .scene.scene import Scene, SequentialScene
from .scene.scene import describe
from .utils.coatings import coating_rt, unpolarized_reflectance
from .utils.glass import glass, glass_pair
from .utils.fieldscan import FieldScan, field_scan
from .utils.focus import best_focus_plane, refocus, through_focus_rms
from .utils.firstorder import FirstOrder, RayFan, first_order, ray_fan
from .utils.seidel import SeidelReport, paraxial_prescription, seidel, seidel_table
from .utils.ghosts import ghost_pairs, ghost_report, ghost_trace
from .utils.sensitivity import (allocate_tolerances, tolerance_sensitivity,
                                tolerance_yield)
from .utils.tolerancing import monte_carlo_tolerance, per_ray_perturbed_trace
from .utils.imaging import convolve_psf, simulate_image
from .utils.footprint import footprint_report, footprints
from .utils.thermal import (THERMAL, opto_thermal_coefficient,
                            thermal_perturb)
from .utils.zemax import load_zmx, parse_zmx, save_zmx
from .utils.psf import (diffraction_mtf, diffraction_psf,
                        encircled_energy, fiber_coupling,
                        polychromatic_psf, pupil_from_trace, strehl_ratio,
                        vector_psf, vector_pupil_from_trace)
from .utils.wavefront import best_focus, interferogram, wavefront_rms
from .utils.propagation import (angular_spectrum, fresnel_transfer,
                                through_focus_psf)
from .utils.beamprop import wave_trace
from .utils.phase_retrieval import phase_diversity
from .utils.coherence import gsm_modes, incoherent_mode_sum
from .utils.turbulence import kolmogorov_screens, long_exposure_psf

__version__ = '0.1.0'
