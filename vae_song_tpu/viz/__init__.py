from vae_song_tpu.viz.plots import (
    visualize_2c_points_on_image,
    save_image_grid,
    plot_heatmap,
    plot_2d_histogram,
    visualize_flows,
    save_point_cloud,
    logscale_plt_color_map,
)
from vae_song_tpu.viz.pca import (
    pca_calculation,
    pca_plot,
    pca_visualization,
    rec_lr_scatter_visualization,
)

__all__ = [
    "visualize_2c_points_on_image",
    "save_image_grid",
    "plot_heatmap",
    "plot_2d_histogram",
    "visualize_flows",
    "save_point_cloud",
    "logscale_plt_color_map",
    "pca_calculation",
    "pca_plot",
    "pca_visualization",
]
