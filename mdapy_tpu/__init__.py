"""mdapy_tpu — a TPU-native molecular-dynamics analysis & visualization framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of the
reference library mdapy (see SURVEY.md): simulation-box + System data model,
cell-list / k-NN neighbor engines, structural-analysis algorithms, lattice and
polycrystal builders, EAM/NEP potentials with a FIRE minimizer, trajectory
tooling, and a differentiable ray-tracing renderer (spheres + bond cylinders,
AA / shadows / AO) that runs as batched XLA/Pallas kernels and tile-shards the
ray grid across device meshes.

Public API mirrors the reference's re-export surface
(reference: src/mdapy/__init__.py:34-85).  Imports are lazy so that optional
subsystems do not slow down or break ``import mdapy_tpu``.
"""

__version__ = "0.1.0"

# name -> (module, attribute)
_LAZY = {
    "Box": (".core.box", "Box"),
    "init_box": (".core.box", "init_box"),
    "System": (".core.system", "System"),
    "AtomFrame": (".core.frame", "AtomFrame"),
    "element_data": (".core", "elements"),
    "BuildSystem": (".io.load_save", "BuildSystem"),
    "SaveSystem": (".io.load_save", "SaveSystem"),
    "load": (".io.load_save", "load"),
    "save": (".io.load_save", "save"),
    "Neighbor": (".neighbor.neighbor", "Neighbor"),
    "NearestNeighbor": (".neighbor.knn", "NearestNeighbor"),
    "CentroSymmetryParameter": (".analysis.centro_symmetry_parameter", "CentroSymmetryParameter"),
    "CommonNeighborAnalysis": (".analysis.common_neighbor_analysis", "CommonNeighborAnalysis"),
    "AcklandJonesAnalysis": (".analysis.ackland_jones_analysis", "AcklandJonesAnalysis"),
    "CommonNeighborParameter": (".analysis.common_neighbor_parameter", "CommonNeighborParameter"),
    "IdentifyDiamondStructure": (".analysis.identify_diamond_structure", "IdentifyDiamondStructure"),
    "RadialDistributionFunction": (".analysis.radial_distribution_function", "RadialDistributionFunction"),
    "SteinhardtBondOrientation": (".analysis.steinhardt_bond_orientation", "SteinhardtBondOrientation"),
    "StructureEntropy": (".analysis.structure_entropy", "StructureEntropy"),
    "AtomicStrain": (".analysis.atomic_strain", "AtomicStrain"),
    "AtomicTemperature": (".analysis.atomic_temperature", "AtomicTemperature"),
    "WarrenCowleyParameter": (".analysis.warren_cowley_parameter", "WarrenCowleyParameter"),
    "ClusterAnalysis": (".analysis.cluster_analysis", "ClusterAnalysis"),
    "MeanSquaredDisplacement": (".analysis.mean_squared_displacement", "MeanSquaredDisplacement"),
    "LindemannParameter": (".analysis.lindemann_parameter", "LindemannParameter"),
    "WignerSeitzAnalysis": (".analysis.wigner_seitz_defect", "WignerSeitzAnalysis"),
    "VoidAnalysis": (".analysis.void_analysis", "VoidAnalysis"),
    "AngularDistributionFunction": (".analysis.angular_distribution_function", "AngularDistributionFunction"),
    "BondAnalysis": (".analysis.bond_analysis", "BondAnalysis"),
    "StructureFactor": (".analysis.structure_factor", "StructureFactor"),
    "SpatialBinning": (".analysis.spatial_binning", "SpatialBinning"),
    "ChillPlus": (".analysis.chill_plus", "ChillPlus"),
    "IdentifyFccPlanarFaults": (".analysis.identify_fcc_planar_faults", "IdentifyFccPlanarFaults"),
    # Back-compat alias (all-caps FCC spelling) for the same class.
    "IdentifyFCCPlanarFaults": (".analysis.identify_fcc_planar_faults", "IdentifyFccPlanarFaults"),
    "PolyhedralTemplateMatching": (".analysis.ptm", "PolyhedralTemplateMatching"),
    "VoronoiAnalysis": (".analysis.voronoi", "VoronoiAnalysis"),
    "build_crystal": (".build.lattice", "build_crystal"),
    "build_hea": (".build.lattice", "build_hea"),
    "LatticeRegistry": (".build.lattice", "LatticeRegistry"),
    "CreatePolycrystal": (".build.polycrystal", "CreatePolycrystal"),
    "orthogonal_cell": (".build.orthogonal_cell", "orthogonal_cell"),
    "SQS": (".build.sqs", "SQS"),
    "BondStiffness": (".potentials.bond_stiffness", "BondStiffness"),
    "EAMGenerator": (".potentials.eam", "EAMGenerator"),
    "Phonon": (".analysis.phonon", "Phonon"),
    "LammpsPotential": (".potentials.lammps", "LammpsPotential"),
    "LammpsRunner": (".potentials.lammps", "LammpsRunner"),
    "NEP4ASE": (".potentials.nep4ase", "NEP4ASE"),
    "MDElastic": (".potentials.md_elastic", "MDElastic"),
    "QHAElastic": (".potentials.qha_elastic", "QHAElastic"),
    "View": (".render.visualize", "View"),
    "set_pka": (".utils.tool_function", "set_pka"),
    "generate_velocity": (".utils.tool_function", "generate_velocity"),
    "split_xyz": (".utils.tool_function", "split_xyz"),
    "rmse": (".utils.potential_tool", "rmse"),
    "read_thermo": (".utils.potential_tool", "read_thermo"),
    "plot_nep_train": (".utils.potential_tool", "plot_nep_train"),
    "get_sfe_fcc": (".utils.potential_tool", "get_sfe_fcc"),
    "get_average_sfe_fcc_hea": (".utils.potential_tool", "get_average_sfe_fcc_hea"),
    "get_eos": (".utils.potential_tool", "get_eos"),
    "PCA": (".utils.potential_tool", "PCA"),
    "fps_sample": (".utils.potential_tool", "fps_sample"),
    "cfg2xyz": (".utils.potential_tool", "cfg2xyz"),
    "read_OUTCAR": (".utils.potential_tool", "read_OUTCAR"),
    "outcar2xyz": (".utils.potential_tool", "outcar2xyz"),
    "outcars2xyz": (".utils.potential_tool", "outcars2xyz"),
    "run_gpumd": (".utils.potential_tool", "run_gpumd"),
    "compress_file": (".utils.pigz", "compress_file"),
    "get_num_threads": (".utils.parallel", "get_num_threads"),
    "Spline": (".utils.spline", "Spline"),
    "pltset": (".utils.plotset", "pltset"),
    "set_figure": (".utils.plotset", "set_figure"),
    "save_figure": (".utils.plotset", "save_figure"),
    "CalculatorMP": (".potentials.calculator", "CalculatorMP"),
    "EAM": (".potentials.eam", "EAM"),
    "EAMAverage": (".potentials.eam", "EAMAverage"),
    "NEP": (".potentials.nep", "NEP"),
    "FIRE": (".potentials.minimizer", "FIRE"),
    "get_elastic_constant": (".potentials.elastic", "get_elastic_constant"),
    "Trajectory": (".io.trajectory", "Trajectory"),
    "XYZTrajectory": (".io.trajectory", "XYZTrajectory"),
    "unwrap_trajectory": (".io.trajectory", "unwrap_trajectory"),
    "TachyonRender": (".render.render", "TachyonRender"),
    "CameraParams": (".render.render", "CameraParams"),
    "preset_camera": (".render.camera", "preset_camera"),
    "auto_camera": (".render.camera", "auto_camera"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'mdapy_tpu' has no attribute {name!r}") from None
    import importlib

    module = importlib.import_module(module_name, __name__)
    value = getattr(module, attr)
    globals()[name] = value
    return value


def __dir__():
    return __all__ + ["__version__"]
