from .solve import spd_block_inverse, solve_normal_refined, householder_lastrow
