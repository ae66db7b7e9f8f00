// Clean-room SDL2 stub: only what the reference's headless CPU path touches
// (renv::Color uses nothing from SDL; Canvas::get_surface is never called).
#pragma once
#include <cstdint>

struct SDL_Surface;
inline SDL_Surface* SDL_CreateRGBSurfaceFrom(void*, int, int, int, int,
                                             unsigned, unsigned, unsigned,
                                             unsigned) { return nullptr; }
inline void SDL_FreeSurface(SDL_Surface*) {}
