package graft.core

/**
 * WMTS-style z/x/y tile pyramid math over a planar domain (the raster side of
 * the raster↔vector assignment operator). Tile matrix: at zoom z the domain is
 * a 2^z × 2^z grid; y counts from the TOP edge (WMTS/TMS "row" convention).
 *
 * Domain matches [[ZGrid]] (Span × Span metres anchored at the origin) so a
 * zoom-z tile equals a level-z quad cell with flipped y — giving the engine a
 * single clustering key family across cell index and tile pyramid.
 */
object Tiles {

  val Span: Double = ZGrid.Span

  final case class Tile(z: Int, x: Long, y: Long)

  def tileSize(z: Int): Double = Span / (1L << z).toDouble

  /** Pack into a sortable long: [6 bits z][29 bits x][29 bits y]. */
  def pack(t: Tile): Long = (t.z.toLong << 58) | (t.x << 29) | t.y
  def unpack(id: Long): Tile =
    Tile((id >>> 58).toInt, (id >>> 29) & ((1L << 29) - 1), id & ((1L << 29) - 1))

  def tileOf(x: Double, y: Double, z: Int): Tile = {
    val n = 1L << z
    def clampIdx(v: Long) = math.max(0L, math.min(n - 1, v))
    val tx = clampIdx(math.floor(x / Span * n).toLong)
    val tyFromBottom = clampIdx(math.floor(y / Span * n).toLong)
    Tile(z, tx, n - 1 - tyFromBottom)
  }

  /** Tiles at zoom z intersecting the rectangle (touching included). */
  def coverRect(minx: Double, miny: Double, maxx: Double, maxy: Double, z: Int): Array[Tile] = {
    val n = 1L << z
    def clampIdx(v: Long) = math.max(0L, math.min(n - 1, v))
    val tx0 = clampIdx(math.floor(minx / Span * n).toLong)
    val tx1 = clampIdx(math.floor(maxx / Span * n).toLong)
    // y flips: maxy -> smallest row
    val ty0 = clampIdx(n - 1 - math.floor(maxy / Span * n).toLong)
    val ty1 = clampIdx(n - 1 - math.floor(miny / Span * n).toLong)
    val out = new Array[Tile](((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).toInt)
    var k = 0
    var xi = tx0
    while (xi <= tx1) {
      var yi = ty0
      while (yi <= ty1) { out(k) = Tile(z, xi, yi); k += 1; yi += 1 }
      xi += 1
    }
    out
  }

  /** Geographic bounds of a tile: (minx, miny, maxx, maxy). */
  def bounds(t: Tile): (Double, Double, Double, Double) = {
    val s = tileSize(t.z)
    val minx = t.x * s
    val maxyTop = Span - t.y * s
    (minx, maxyTop - s, minx + s, maxyTop)
  }

  def parent(t: Tile): Tile = {
    require(t.z > 0)
    Tile(t.z - 1, t.x >> 1, t.y >> 1)
  }
}
