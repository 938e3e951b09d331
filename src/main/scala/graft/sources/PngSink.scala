package graft.sources

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color}

import graft.model.Footprint

/**
 * Diagnostic footprint/index renderer — the reference's R-tree PNG sink
 * (S9, `CityKGDB.exportRTreeFootprints`, CityKGDB.java:428-440): one
 * 1000×1000 PNG per partition showing footprint envelopes and rings.
 * Non-semantic; driver-side only.
 */
object PngSink {

  def render(fps: Seq[Footprint], path: String, size: Int = 1000): Unit = {
    if (fps.isEmpty) return
    val minx = fps.map(_.env.minx).min
    val miny = fps.map(_.env.miny).min
    val maxx = fps.map(_.env.maxx).max
    val maxy = fps.map(_.env.maxy).max
    val sx = (size - 20) / math.max(maxx - minx, 1e-9)
    val sy = (size - 20) / math.max(maxy - miny, 1e-9)
    val s = math.min(sx, sy)
    def px(x: Double) = 10 + ((x - minx) * s).toInt
    def py(y: Double) = size - 10 - ((y - miny) * s).toInt

    val bi = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val g = bi.createGraphics()
    g.setColor(Color.WHITE); g.fillRect(0, 0, size, size)
    g.setStroke(new BasicStroke(1f))
    fps.foreach { f =>
      g.setColor(new Color(200, 200, 255))
      g.drawRect(px(f.env.minx), py(f.env.maxy),
        math.max(1, ((f.env.maxx - f.env.minx) * s).toInt),
        math.max(1, ((f.env.maxy - f.env.miny) * s).toInt))
      g.setColor(Color.BLUE)
      val ring = f.ring
      var i = 0
      while (i < ring.size - 1) {
        g.drawLine(px(ring(i).x), py(ring(i).y), px(ring(i + 1).x), py(ring(i + 1).y))
        i += 1
      }
      if (ring.size > 2 && ring.head != ring.last)
        g.drawLine(px(ring.last.x), py(ring.last.y), px(ring.head.x), py(ring.head.y))
    }
    g.dispose()
    javax.imageio.ImageIO.write(bi, "png", new java.io.File(path))
  }
}
