from . import part1, part2, part2_instant, part3, part4
